"""Reference (PyTorch) checkpoint -> flax variables converter.

Maps a ``state_dict`` from the reference model zoo
(``/root/reference/ptsemseg/models/agent.py``) onto this framework's flax
param/batch_stats PyTrees, covering all seven architectures. This is what
makes the "identical mIoU" half of the north star checkable: a reference
``.pkl`` (trainer.py:770-772, test.py:118-121) can be evaluated by this
framework directly.

Layout conversions:

- conv kernels: torch ``(out, in, kh, kw)`` (NCHW) -> flax ``(kh, kw, in, out)``
  (NHWC);
- conv-transpose kernels: torch ``(in, out, kh, kw)`` -> flax
  ``(kh, kw, in, out)`` **with a spatial flip** — torch ``ConvTranspose2d``
  is the adjoint of correlation (kernel effectively flipped) while flax
  ``ConvTranspose(transpose_kernel=False)`` runs an lhs-dilated correlation;
- linear: torch ``(out, in)`` -> flax ``(in, out)``;
- the first MLP layer after a flatten: torch flattens the policy map
  ``(B, 256, h, w)`` in C-major order (agent.py:157 ``view(-1, n_feat)``),
  flax flattens NHWC in HWC-major order — the input axis of the first
  ``Dense`` kernel is permuted accordingly;
- BatchNorm: weight/bias -> scale/bias (params), running_mean/var ->
  mean/var (batch_stats); ``num_batches_tracked`` is dropped.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from multiagentperception_tpu.utils.compat import convert_state_dict


def _np(v) -> np.ndarray:
    """torch.Tensor | np.ndarray -> OWNING np array (no torch import needed).

    Must copy, not view: ``tensor.numpy()`` shares the tensor's storage, and
    jax's CPU backend can zero-copy alias numpy buffers — an aliased import
    would silently track the live torch module (a torch ``optimizer.step()``
    or BN running-stat update would rewrite the "converted" flax weights,
    observed as a 17% gradient mismatch in the train-parity test)."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.array(v)


class _StateDict:
    """Key-tracking view over a torch state_dict (post 'module.' strip)."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = {k: v for k, v in convert_state_dict(sd).items()}
        self.used: set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"reference state_dict is missing '{key}'")
        self.used.add(key)
        return _np(self.sd[key])

    def has(self, key: str) -> bool:
        return key in self.sd


# ---------------------------------------------------------------- primitives

def _conv(sd: _StateDict, tp: str, bias: bool = True) -> dict:
    out = {"kernel": sd.take(f"{tp}.weight").transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = sd.take(f"{tp}.bias")
    return out


def _deconv(sd: _StateDict, tp: str, bias: bool = True) -> dict:
    w = sd.take(f"{tp}.weight")  # (in, out, kh, kw)
    out = {"kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()}
    if bias:
        out["bias"] = sd.take(f"{tp}.bias")
    return out


def _bn(sd: _StateDict, tp: str) -> tuple[dict, dict]:
    params = {"scale": sd.take(f"{tp}.weight"), "bias": sd.take(f"{tp}.bias")}
    stats = {"mean": sd.take(f"{tp}.running_mean"),
             "var": sd.take(f"{tp}.running_var")}
    if sd.has(f"{tp}.num_batches_tracked"):
        sd.used.add(f"{tp}.num_batches_tracked")
    return params, stats


def _dense(sd: _StateDict, tp: str) -> dict:
    return {"kernel": sd.take(f"{tp}.weight").T, "bias": sd.take(f"{tp}.bias")}


def _dense_chw(sd: _StateDict, tp: str, c: int, h: int, w: int) -> dict:
    """First Dense after the flatten: permute CHW -> HWC input ordering."""
    wt = sd.take(f"{tp}.weight")  # (out, c*h*w), C-major
    out = wt.shape[0]
    kernel = wt.reshape(out, c, h, w).transpose(2, 3, 1, 0).reshape(h * w * c, out)
    return {"kernel": kernel, "bias": sd.take(f"{tp}.bias")}


# ------------------------------------------------------------------- blocks
# Each returns (params_subtree, batch_stats_subtree).

def _cbr(sd: _StateDict, tp: str) -> tuple[dict, dict]:
    """conv2DBatchNormRelu / conv2DBatchNorm -> ConvBNRelu / ConvBN
    (reference models/utils.py:9-120: Sequential .cbr_unit / .cb_unit)."""
    unit = f"{tp}.cbr_unit" if sd.has(f"{tp}.cbr_unit.0.weight") else f"{tp}.cb_unit"
    bn_p, bn_s = _bn(sd, f"{unit}.1")
    return (
        {"Conv_0": _conv(sd, f"{unit}.0"), "BatchNorm_0": bn_p},
        {"BatchNorm_0": bn_s},
    )


def _dcbr(sd: _StateDict, tp: str) -> tuple[dict, dict]:
    """deconv2DBatchNormRelu -> DeconvBNRelu (models/utils.py:148-168)."""
    bn_p, bn_s = _bn(sd, f"{tp}.dcbr_unit.1")
    return (
        {"ConvTranspose_0": _deconv(sd, f"{tp}.dcbr_unit.0"), "BatchNorm_0": bn_p},
        {"BatchNorm_0": bn_s},
    )


def _basic_block(sd: _StateDict, tp: str) -> tuple[dict, dict]:
    p: dict = {"Conv_0": _conv(sd, f"{tp}.conv1", bias=False),
               "Conv_1": _conv(sd, f"{tp}.conv2", bias=False)}
    s: dict = {}
    p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, f"{tp}.bn1")
    p["BatchNorm_1"], s["BatchNorm_1"] = _bn(sd, f"{tp}.bn2")
    if sd.has(f"{tp}.downsample.0.weight"):
        p["Conv_2"] = _conv(sd, f"{tp}.downsample.0", bias=False)
        p["BatchNorm_2"], s["BatchNorm_2"] = _bn(sd, f"{tp}.downsample.1")
    return p, s


def _resnet(sd: _StateDict, tp: str) -> tuple[dict, dict]:
    """pretrainedmodels/torchvision ResNet-18 trunk -> ResnetEncoder
    (reference backbone.py:58-96; fc/last_linear head unused and skipped)."""
    p: dict = {"Conv_0": _conv(sd, f"{tp}.conv1", bias=False)}
    s: dict = {}
    p["BatchNorm_0"], s["BatchNorm_0"] = _bn(sd, f"{tp}.bn1")
    for layer in range(1, 5):
        for blk in range(2):
            name = f"BasicBlock_{(layer - 1) * 2 + blk}"
            p[name], s[name] = _basic_block(sd, f"{tp}.layer{layer}.{blk}")
    return p, s


def _nsegnet_encoder(sd: _StateDict, tp: str) -> tuple[dict, dict]:
    """n_segnet_encoder (backbone.py:12-55): conv1..conv13 cbr blocks."""
    p: dict = {}
    s: dict = {}
    for i in range(13):
        p[f"ConvBNRelu_{i}"], s[f"ConvBNRelu_{i}"] = _cbr(sd, f"{tp}.conv{i + 1}")
    return p, s


def _img_encoder(sd: _StateDict, tp: str, enc_backbone: str) -> tuple[dict, dict]:
    """img_encoder = backbone + squeezer (agent.py:39-60)."""
    if enc_backbone == "resnet_encoder":
        bb_name = "ResnetEncoder_0"
        bb_p, bb_s = _resnet(sd, f"{tp}.feature_backbone.feature_backbone")
    elif enc_backbone == "n_segnet_encoder":
        bb_name = "NSegnetEncoder_0"
        bb_p, bb_s = _nsegnet_encoder(sd, f"{tp}.feature_backbone")
    else:
        raise NotImplementedError(f"encoder backbone {enc_backbone!r}")
    sq_p, sq_s = _cbr(sd, f"{tp}.squeezer")
    return {bb_name: bb_p, "ConvBNRelu_0": sq_p}, {bb_name: bb_s, "ConvBNRelu_0": sq_s}


def _policy_net(sd: _StateDict, tp: str, enc_backbone: str) -> tuple[dict, dict]:
    """policy_net4 = img_encoder + conv1..conv5 (agent.py:114-142)."""
    p: dict = {}
    s: dict = {}
    p["ImgEncoder_0"], s["ImgEncoder_0"] = _img_encoder(
        sd, f"{tp}.img_encoder", enc_backbone)
    for i in range(5):
        p[f"ConvBNRelu_{i}"], s[f"ConvBNRelu_{i}"] = _cbr(sd, f"{tp}.conv{i + 1}")
    return p, s


def _km(sd: _StateDict, tp: str, hw: tuple[int, int]) -> dict:
    """km_generator / linear (agent.py:145-178): fc.0 relu fc.2 relu fc.4.
    Params only (no BN). ``hw`` is the policy-map spatial size (rows//128,
    cols//128) needed for the flatten permutation."""
    h, w = hw
    return {"MLP_0": {
        "Dense_0": _dense_chw(sd, f"{tp}.fc.0", 256, h, w),
        "Dense_1": _dense(sd, f"{tp}.fc.2"),
        "Dense_2": _dense(sd, f"{tp}.fc.4"),
    }}


def _img_decoder(sd: _StateDict, tp: str, dec_backbone: str,
                 feat_squeezer: int) -> tuple[dict, dict]:
    """img_decoder = optional desqueezers + decoder backbone (agent.py:63-89)."""
    p: dict = {}
    s: dict = {}
    if feat_squeezer == 2:
        p["DeconvBNRelu_0"], s["DeconvBNRelu_0"] = _dcbr(sd, f"{tp}.desqueezer")
    elif feat_squeezer == 4:
        p["DeconvBNRelu_0"], s["DeconvBNRelu_0"] = _dcbr(sd, f"{tp}.desqueezer1")
        p["DeconvBNRelu_1"], s["DeconvBNRelu_1"] = _dcbr(sd, f"{tp}.desqueezer2")
    od = f"{tp}.output_decoder"
    if dec_backbone == "simple_decoder":
        p["SimpleDecoder_0"] = {"Conv_0": _conv(sd, f"{od}.pred.0"),
                                "Conv_1": _conv(sd, f"{od}.pred.2")}
    elif dec_backbone == "n_segnet_decoder":
        dp: dict = {}
        ds: dict = {}
        # reference n_segnet_decoder (backbone.py:99-140) names all twelve
        # layers deconv1..deconv12, alternating real deconvs and convs in
        # the same order as NSegnetDecoder's plan.
        deconv_i = conv_i = 0
        for i, is_deconv in enumerate([1, 0, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0]):
            if is_deconv:
                name = f"DeconvBNRelu_{deconv_i}"
                dp[name], ds[name] = _dcbr(sd, f"{od}.deconv{i + 1}")
                deconv_i += 1
            else:
                name = f"ConvBNRelu_{conv_i}"
                dp[name], ds[name] = _cbr(sd, f"{od}.deconv{i + 1}")
                conv_i += 1
        p["NSegnetDecoder_0"] = dp
        s["NSegnetDecoder_0"] = ds
    else:
        raise NotImplementedError(f"decoder backbone {dec_backbone!r}")
    return p, s


def _srms_attention(sd: _StateDict, attention: str) -> tuple[str, dict]:
    """SRMS attention params keyed by this framework's auto module name."""
    if attention == "general":
        return "GeneralDotAttention_0", {"Dense_0": _dense(sd, "attention_net.linear")}
    if attention == "additive":
        return "AdditiveAttention_0", {
            "Dense_0": _dense(sd, "attention_net.linear_feat"),
            "Dense_1": _dense(sd, "attention_net.linear_context"),
            "Dense_2": _dense(sd, "attention_net.linear_out"),
        }
    return "ScaledDotAttention_0", {}


# ------------------------------------------------------------- arch mapping

def _prune(tree: dict) -> dict:
    """Drop empty sub-dicts (modules without BN have no batch_stats entry)."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            v = _prune(v)
            if not v:
                continue
        out[k] = v
    return out


def import_torch_state_dict(cfg: Mapping[str, Any], n_classes: int,
                            state_dict: Mapping[str, Any],
                            template: Mapping[str, Any] | None = None) -> dict:
    """Convert a reference model state_dict into flax variables.

    ``cfg`` is the reference-schema config dict (the same YAML both CLIs
    load); ``template`` is an optional ``model.init(...)`` variables tree —
    when given, path/shape agreement is validated and dtypes are cast to the
    template's.
    """
    m = cfg["model"]
    arch = m["arch"]
    enc = m["enc_backbone"]
    dec = m["dec_backbone"]
    fs = m.get("feat_squeezer", -1) or -1
    rows = cfg["data"]["img_rows"]
    cols = cfg["data"]["img_cols"]
    hw = (rows // 128, cols // 128)
    sd = _StateDict(state_dict)

    P: dict = {}
    S: dict = {}

    def put(flax_name: str, pair: tuple[dict, dict]) -> None:
        P[flax_name], S[flax_name] = pair

    if arch == "Single_agent":
        put("ImgEncoder_0", _img_encoder(sd, "encoder", enc))
        put("ImgDecoder_0", _img_decoder(sd, "decoder", dec, fs))
    elif arch == "All_agents":
        for i in range(1, 6):
            put(f"encoder{i}", _img_encoder(sd, f"encoder{i}", enc))
        put("ImgDecoder_0", _img_decoder(sd, "decoder", dec, fs))
    elif arch == "MIMO_All_agents":
        put("ImgEncoder_0", _img_encoder(sd, "encoder", enc))
        put("ImgDecoder_0", _img_decoder(sd, "decoder", dec, fs))
    elif arch in ("LearnWho2Com", "LearnWhen2Com"):
        shared = m["shared_img_encoder"]
        if shared == "unified":
            put("u_encoder", _img_encoder(sd, "u_encoder", enc))
        elif shared == "only_normal_agents":
            # the reference misspells the attribute ('degarded_encoder',
            # agent.py:699); this framework spells it correctly
            put("degraded_encoder", _img_encoder(sd, "degarded_encoder", enc))
            put("normal_encoder", _img_encoder(sd, "normal_encoder", enc))
        else:
            for i in range(1, 6):
                put(f"encoder{i}", _img_encoder(sd, f"encoder{i}", enc))
        put("PolicyNet4_0", _policy_net(sd, "query_key_net", enc))
        P["key_net"] = _km(sd, "key_net", hw)
        if m["query"]:
            P["query_net"] = _km(sd, "query_net", hw)
        attn_name, attn_p = _srms_attention(sd, m["attention"])
        if attn_p:
            P[attn_name] = attn_p
        put("ImgDecoder_0", _img_decoder(sd, "decoder", dec, fs))
        # LearnWhen2Com additionally owns an (unused at eval) argmax_decoder
        # (agent.py:731) — intentionally not imported; this framework has no
        # counterpart module.
    elif arch in ("MIMOcom", "MIMOcomWho"):
        put("u_encoder", _img_encoder(sd, "u_encoder", enc))
        put("query_key_net", _policy_net(sd, "query_key_net", enc))
        P["key_net"] = _km(sd, "key_net", hw)
        if m["query"]:
            P["query_net"] = _km(sd, "query_net", hw)
        if arch == "MIMOcom":
            P["MIMOGeneralDotAttention_0"] = {
                "proj": _dense(sd, "attention_net.linear")}
        else:
            P["MIMOWhoGeneralDotAttention_0"] = {
                "Dense_0": _dense(sd, "attention_net.linear")}
        put("ImgDecoder_0", _img_decoder(sd, "decoder", dec, fs))
    else:
        raise KeyError(f"Model {arch} not available")

    variables = {"params": _prune(P), "batch_stats": _prune(S)}
    if template is not None:
        variables = _validate_and_cast(variables, template)
    return variables


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}"
        if isinstance(v, Mapping):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _validate_and_cast(variables: dict, template: Mapping[str, Any]) -> dict:
    import jax.numpy as jnp

    got = _flatten(variables)
    want = _flatten({k: template[k] for k in ("params", "batch_stats")
                     if k in template})
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    if missing or extra:
        raise ValueError(
            "converted tree does not match the model's variable structure\n"
            f"  missing ({len(missing)}): {missing[:8]}\n"
            f"  extra ({len(extra)}): {extra[:8]}")
    bad = [p for p in want if tuple(want[p].shape) != tuple(got[p].shape)]
    if bad:
        detail = ", ".join(
            f"{p}: torch{tuple(got[p].shape)} vs flax{tuple(want[p].shape)}"
            for p in bad[:5])
        raise ValueError(f"shape mismatch after conversion: {detail}")

    def cast(dst, src):
        if isinstance(dst, Mapping):
            return {k: cast(dst[k], src[k]) for k in dst}
        return jnp.asarray(src, dtype=dst.dtype)

    return {k: cast(template[k], variables[k])
            for k in variables}


def load_reference_checkpoint(cfg: Mapping[str, Any], n_classes: int,
                              path: str,
                              template: Mapping[str, Any] | None = None) -> dict:
    """Load a reference ``.pkl`` checkpoint (torch.save dict with
    'model_state', trainer.py:229-240) or a bare state_dict and convert it."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("model_state", blob) if isinstance(blob, dict) else blob
    return import_torch_state_dict(cfg, n_classes, sd, template)

"""flax variables -> reference (PyTorch) state_dict converter.

The inverse of ``torch_import``: lets models trained in this framework run
in the reference PyTorch code (or any torch tooling that consumes
ptsemseg checkpoints). The roundtrip ``import -> export`` reproduces the
original state_dict bit-for-bit (tests/test_parity.py).

Transforms (inverses of torch_import's):
- conv kernel ``(kh, kw, in, out)`` -> ``(out, in, kh, kw)``;
- conv-transpose kernel: undo the spatial flip, ``-> (in, out, kh, kw)``;
- linear kernel ``(in, out)`` -> ``(out, in)``;
- the first post-flatten Dense: permute the input axis back HWC -> CHW;
- BatchNorm scale/bias/mean/var -> weight/bias/running_mean/running_var
  (+ ``num_batches_tracked`` zeros, which torch expects).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Mapping

import numpy as np


def _np(v) -> np.ndarray:
    return np.asarray(v)


class _Out:
    def __init__(self):
        self.sd: "OrderedDict[str, np.ndarray]" = OrderedDict()

    def put(self, key: str, value: np.ndarray) -> None:
        self.sd[key] = np.asarray(value)


# ---------------------------------------------------------------- primitives

def _conv(out: _Out, tp: str, p: Mapping[str, Any]) -> None:
    out.put(f"{tp}.weight", _np(p["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in p:
        out.put(f"{tp}.bias", _np(p["bias"]))


def _deconv(out: _Out, tp: str, p: Mapping[str, Any]) -> None:
    k = _np(p["kernel"])[::-1, ::-1]  # undo flip
    out.put(f"{tp}.weight", k.transpose(2, 3, 0, 1))
    if "bias" in p:
        out.put(f"{tp}.bias", _np(p["bias"]))


def _bn(out: _Out, tp: str, p: Mapping[str, Any], s: Mapping[str, Any]) -> None:
    out.put(f"{tp}.weight", _np(p["scale"]))
    out.put(f"{tp}.bias", _np(p["bias"]))
    out.put(f"{tp}.running_mean", _np(s["mean"]))
    out.put(f"{tp}.running_var", _np(s["var"]))
    out.put(f"{tp}.num_batches_tracked", np.zeros((), np.int64))


def _dense(out: _Out, tp: str, p: Mapping[str, Any]) -> None:
    out.put(f"{tp}.weight", _np(p["kernel"]).T)
    out.put(f"{tp}.bias", _np(p["bias"]))


def _dense_chw(out: _Out, tp: str, p: Mapping[str, Any],
               c: int, h: int, w: int) -> None:
    k = _np(p["kernel"])  # (h*w*c, out)
    o = k.shape[1]
    out.put(f"{tp}.weight",
            k.reshape(h, w, c, o).transpose(3, 2, 0, 1).reshape(o, c * h * w))
    out.put(f"{tp}.bias", _np(p["bias"]))


# ------------------------------------------------------------------- blocks

def _cbr(out: _Out, tp: str, p, s, unit: str = "cbr_unit") -> None:
    _conv(out, f"{tp}.{unit}.0", p["Conv_0"])
    _bn(out, f"{tp}.{unit}.1", p["BatchNorm_0"], s["BatchNorm_0"])


def _dcbr(out: _Out, tp: str, p, s) -> None:
    _deconv(out, f"{tp}.dcbr_unit.0", p["ConvTranspose_0"])
    _bn(out, f"{tp}.dcbr_unit.1", p["BatchNorm_0"], s["BatchNorm_0"])


def _basic_block(out: _Out, tp: str, p, s) -> None:
    _conv(out, f"{tp}.conv1", p["Conv_0"])
    _bn(out, f"{tp}.bn1", p["BatchNorm_0"], s["BatchNorm_0"])
    _conv(out, f"{tp}.conv2", p["Conv_1"])
    _bn(out, f"{tp}.bn2", p["BatchNorm_1"], s["BatchNorm_1"])
    if "Conv_2" in p:
        _conv(out, f"{tp}.downsample.0", p["Conv_2"])
        _bn(out, f"{tp}.downsample.1", p["BatchNorm_2"], s["BatchNorm_2"])


def _resnet(out: _Out, tp: str, p, s) -> None:
    _conv(out, f"{tp}.conv1", p["Conv_0"])
    _bn(out, f"{tp}.bn1", p["BatchNorm_0"], s["BatchNorm_0"])
    for layer in range(1, 5):
        for blk in range(2):
            name = f"BasicBlock_{(layer - 1) * 2 + blk}"
            _basic_block(out, f"{tp}.layer{layer}.{blk}", p[name], s[name])


def _img_encoder(out: _Out, tp: str, p, s, enc: str) -> None:
    if enc == "resnet_encoder":
        _resnet(out, f"{tp}.feature_backbone.feature_backbone",
                p["ResnetEncoder_0"], s["ResnetEncoder_0"])
    elif enc == "n_segnet_encoder":
        for i in range(13):
            _cbr(out, f"{tp}.feature_backbone.conv{i + 1}",
                 p["NSegnetEncoder_0"][f"ConvBNRelu_{i}"],
                 s["NSegnetEncoder_0"][f"ConvBNRelu_{i}"])
    else:
        raise NotImplementedError(enc)
    _cbr(out, f"{tp}.squeezer", p["ConvBNRelu_0"], s["ConvBNRelu_0"])


def _policy_net(out: _Out, tp: str, p, s, enc: str) -> None:
    _img_encoder(out, f"{tp}.img_encoder", p["ImgEncoder_0"],
                 s["ImgEncoder_0"], enc)
    for i in range(5):
        _cbr(out, f"{tp}.conv{i + 1}", p[f"ConvBNRelu_{i}"],
             s[f"ConvBNRelu_{i}"])


def _km(out: _Out, tp: str, p, hw: tuple[int, int]) -> None:
    h, w = hw
    mlp = p["MLP_0"]
    _dense_chw(out, f"{tp}.fc.0", mlp["Dense_0"], 256, h, w)
    _dense(out, f"{tp}.fc.2", mlp["Dense_1"])
    _dense(out, f"{tp}.fc.4", mlp["Dense_2"])


def _img_decoder(out: _Out, tp: str, p, s, dec: str, fs: int) -> None:
    if fs == 2:
        _dcbr(out, f"{tp}.desqueezer", p["DeconvBNRelu_0"], s["DeconvBNRelu_0"])
    elif fs == 4:
        _dcbr(out, f"{tp}.desqueezer1", p["DeconvBNRelu_0"], s["DeconvBNRelu_0"])
        _dcbr(out, f"{tp}.desqueezer2", p["DeconvBNRelu_1"], s["DeconvBNRelu_1"])
    od = f"{tp}.output_decoder"
    if dec == "simple_decoder":
        _conv(out, f"{od}.pred.0", p["SimpleDecoder_0"]["Conv_0"])
        _conv(out, f"{od}.pred.2", p["SimpleDecoder_0"]["Conv_1"])
    elif dec == "n_segnet_decoder":
        dp, ds = p["NSegnetDecoder_0"], s["NSegnetDecoder_0"]
        deconv_i = conv_i = 0
        for i, is_deconv in enumerate([1, 0, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0]):
            if is_deconv:
                _dcbr(out, f"{od}.deconv{i + 1}",
                      dp[f"DeconvBNRelu_{deconv_i}"], ds[f"DeconvBNRelu_{deconv_i}"])
                deconv_i += 1
            else:
                _cbr(out, f"{od}.deconv{i + 1}",
                     dp[f"ConvBNRelu_{conv_i}"], ds[f"ConvBNRelu_{conv_i}"])
                conv_i += 1
    else:
        raise NotImplementedError(dec)


# ------------------------------------------------------------- arch mapping

def export_torch_state_dict(cfg: Mapping[str, Any],
                            variables: Mapping[str, Any]) -> "OrderedDict":
    """Convert flax variables {'params', 'batch_stats'} into a reference
    torch state_dict (numpy arrays; wrap with torch.as_tensor to torch.save)."""
    m = cfg["model"]
    arch = m["arch"]
    enc = m["enc_backbone"]
    dec = m["dec_backbone"]
    fs = m.get("feat_squeezer", -1) or -1
    hw = (cfg["data"]["img_rows"] // 128, cfg["data"]["img_cols"] // 128)
    P = variables["params"]
    S = variables.get("batch_stats", {})
    out = _Out()

    def enc_of(flax_name, torch_name=None):
        _img_encoder(out, torch_name or flax_name, P[flax_name],
                     S[flax_name], enc)

    def dec_of(flax_name="ImgDecoder_0", torch_name="decoder"):
        _img_decoder(out, torch_name, P[flax_name], S.get(flax_name, {}),
                     dec, fs)

    if arch == "Single_agent":
        enc_of("ImgEncoder_0", "encoder")
        dec_of()
    elif arch == "All_agents":
        for i in range(1, 6):
            enc_of(f"encoder{i}")
        dec_of()
    elif arch == "MIMO_All_agents":
        enc_of("ImgEncoder_0", "encoder")
        dec_of()
    elif arch in ("LearnWho2Com", "LearnWhen2Com"):
        shared = m["shared_img_encoder"]
        if shared == "unified":
            enc_of("u_encoder")
        elif shared == "only_normal_agents":
            enc_of("degraded_encoder", "degarded_encoder")  # ref misspelling
            enc_of("normal_encoder")
        else:
            for i in range(1, 6):
                enc_of(f"encoder{i}")
        _policy_net(out, "query_key_net", P["PolicyNet4_0"],
                    S["PolicyNet4_0"], enc)
        _km(out, "key_net", P["key_net"], hw)
        if m["query"]:
            _km(out, "query_net", P["query_net"], hw)
        if m["attention"] == "general":
            _dense(out, "attention_net.linear",
                   P["GeneralDotAttention_0"]["Dense_0"])
        elif m["attention"] == "additive":
            a = P["AdditiveAttention_0"]
            _dense(out, "attention_net.linear_feat", a["Dense_0"])
            _dense(out, "attention_net.linear_context", a["Dense_1"])
            _dense(out, "attention_net.linear_out", a["Dense_2"])
        dec_of()
    elif arch in ("MIMOcom", "MIMOcomWho"):
        enc_of("u_encoder")
        _policy_net(out, "query_key_net", P["query_key_net"],
                    S["query_key_net"], enc)
        _km(out, "key_net", P["key_net"], hw)
        if m["query"]:
            _km(out, "query_net", P["query_net"], hw)
        if arch == "MIMOcom":
            _dense(out, "attention_net.linear",
                   P["MIMOGeneralDotAttention_0"]["proj"])
        else:
            _dense(out, "attention_net.linear",
                   P["MIMOWhoGeneralDotAttention_0"]["Dense_0"])
        dec_of()
    else:
        raise KeyError(f"Model {arch} not available")
    return out.sd


def save_reference_checkpoint(cfg: Mapping[str, Any], variables,
                              path: str, epoch: int = 0,
                              best_iou: float = 0.0) -> None:
    """torch.save a reference-format .pkl ({'model_state': ...},
    trainer.py:229-240) loadable by the reference test.py."""
    import torch

    sd = OrderedDict(
        (k, torch.as_tensor(np.ascontiguousarray(v).copy()))
        for k, v in export_torch_state_dict(cfg, variables).items()
    )
    torch.save({"epoch": epoch, "model_state": sd, "best_iou": best_iou}, path)

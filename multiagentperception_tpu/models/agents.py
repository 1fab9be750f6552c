"""Multi-agent perception model zoo (reference: ptsemseg/models/agent.py).

All seven reference architectures, re-designed TPU-first:

- inputs arrive as ``(B, N, H, W, 3)`` (NHWC); the agent axis is folded into
  the batch for every conv tower (one encoder call on ``(B*N, H, W, 3)``
  instead of the reference's per-agent Python loops, agent.py:1106-1119);
- the communication handshake is a single ``(B, K, Q)`` einsum + softmax/
  sparsemax (attention.py);
- the hard/thresholded inference modes are one-hot matmuls and masked
  einsums (ops/comm.py) — no per-sample Python branching
  (replaces agent.py:772-798, 1036-1078);
- ``training`` / ``inference`` / ``mo_flag`` are static (Python) arguments:
  each mode traces to its own fused XLA program.

``bn_train`` decouples BatchNorm's mode from path selection: ``train=True,
bn_train=False`` runs the TRAINING forward (gradient-path branches, stat-free)
on frozen running averages — the fine-tune idiom ``training.freeze_bn_stats``
uses. Defaults to ``train`` (the reference's coupled model.train()/eval()
semantics).

Per-agent outputs are stacked batch-major: ``out[b*N + n]`` is agent ``n`` of
sample ``b``. (The reference stacks agent-major; only internal consistency
with labels/masks matters, and the trainer stacks labels the same way.)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multiagentperception_tpu.models.attention import (
    MIMOGeneralDotAttention,
    MIMOWhoGeneralDotAttention,
    get_srms_attention,
)
from multiagentperception_tpu.models.modules import (
    ImgDecoder,
    ImgEncoder,
    KMGenerator,
    PolicyNet4,
)
from multiagentperception_tpu.ops.comm import (
    activated_select,
    argmax_select,
    fuse_values,
    num_connect_offdiag,
    one_hot_argmax,
    topk_select,
)
from multiagentperception_tpu.ops.pallas.comm_fusion import fused_comm_step


def _fold_agents(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, ...) -> (B*N, ...) batch-major."""
    return x.reshape((-1,) + x.shape[2:])


def _unfold_agents(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B*N, ...) -> (B, N, ...)."""
    return x.reshape((-1, n) + x.shape[1:])


class SingleAgent(nn.Module):
    """Plain encoder -> decoder, no communication (reference: agent.py:375-395).

    With ``multiple_output`` the trainer folds all views into the batch dim —
    the MRMS allnorm/occdeg baseline.
    """

    n_classes: int = 11
    feat_channel: int = 512
    feat_squeezer: int = -1
    enc_backbone: str = "resnet_encoder"
    dec_backbone: str = "simple_decoder"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 bn_train: bool | None = None) -> jnp.ndarray:
        bn = train if bn_train is None else bn_train
        feat = ImgEncoder(self.feat_channel, self.feat_squeezer,
                          self.enc_backbone, dtype=self.dtype)(x, bn)
        return ImgDecoder(self.n_classes, self.feat_squeezer,
                          self.dec_backbone, dtype=self.dtype)(feat, bn)


class AllAgents(nn.Module):
    """SRMS fusion baselines: five per-agent encoders, fuse by concatenating
    all five ('catall'), the first two ('fixed2'), or one randomly selected
    supporter ('selection' == the randcom baseline)
    (reference: agent.py:399-469).
    """

    n_classes: int = 11
    feat_channel: int = 512
    feat_squeezer: int = -1
    shuffle_flag: Any = None  # None | 'fixed2' | 'selection'
    agent_num: int = 5
    enc_backbone: str = "resnet_encoder"
    dec_backbone: str = "simple_decoder"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 bn_train: bool | None = None):
        bn = train if bn_train is None else bn_train
        b, n = x.shape[0], x.shape[1]
        feats = [
            ImgEncoder(self.feat_channel, self.feat_squeezer, self.enc_backbone,
                       dtype=self.dtype, name=f"encoder{i + 1}")(x[:, i], bn)
            for i in range(n)
        ]
        if self.shuffle_flag == "selection":
            # One random supporter for the whole batch (reference picks a
            # single aux_id per forward, agent.py:452-456).
            aux_id = jax.random.randint(self.make_rng("action"), (), 0, n)
            stacked = jnp.stack(feats, axis=0)  # (N, B, h, w, C)
            aux = stacked[aux_id]
            fused = jnp.concatenate([feats[0], aux], axis=-1)
            pred = ImgDecoder(self.n_classes, self.feat_squeezer,
                              self.dec_backbone, dtype=self.dtype)(fused, bn)
            rand_action = jnp.full((b,), aux_id, dtype=jnp.int32)
            return pred, rand_action
        if self.shuffle_flag == "fixed2":
            fused = jnp.concatenate(feats[:2], axis=-1)
        else:  # catall
            fused = jnp.concatenate(feats, axis=-1)
        return ImgDecoder(self.n_classes, self.feat_squeezer,
                          self.dec_backbone, dtype=self.dtype)(fused, bn)


class MIMOAllAgents(nn.Module):
    """MRMS fusion baselines with a shared encoder: rotation-ordered concat of
    all N ('catall'), per-agent random pick ('selection' == mrms randcom), or
    mean-of-others ('ComNet') (reference: agent.py:892-980). Outputs stacked
    into the batch dim, one segmentation per agent.
    """

    n_classes: int = 11
    feat_channel: int = 512
    feat_squeezer: int = -1
    shuffle_flag: Any = None  # None/'catall' | 'selection' | 'ComNet'
    agent_num: int = 6
    enc_backbone: str = "resnet_encoder"
    dec_backbone: str = "simple_decoder"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 bn_train: bool | None = None):
        bn = train if bn_train is None else bn_train
        b, n = x.shape[0], x.shape[1]
        feats = _unfold_agents(
            ImgEncoder(self.feat_channel, self.feat_squeezer, self.enc_backbone,
                       dtype=self.dtype)(_fold_agents(x), bn),
            n,
        )  # (B, N, h, w, C)
        decoder = ImgDecoder(self.n_classes, self.feat_squeezer,
                             self.dec_backbone, dtype=self.dtype)

        if self.shuffle_flag == "selection":
            # One random partner per agent, shared across the batch
            # (reference: agent.py:948-957).
            rand_ids = jax.random.randint(self.make_rng("action"), (n,), 0, n)
            partner = jnp.take(feats, rand_ids, axis=1)  # (B, N, h, w, C)
            fused = jnp.concatenate([feats, partner], axis=-1)
            pred = decoder(_fold_agents(fused), bn)
            rand_action = jnp.broadcast_to(rand_ids[None, :], (b, n)).astype(jnp.int32)
            return pred, rand_action
        if self.shuffle_flag == "ComNet":
            mean_others = (jnp.sum(feats, axis=1, keepdims=True) - feats) / (n - 1)
            fused = jnp.concatenate([feats, mean_others], axis=-1)
            return decoder(_fold_agents(fused), bn)
        # catall with the reference's rotation ordering: agent i sees
        # [feat_i, feat_{i+1}, ..., feat_{i+N-1}] (agent.py:969-975).
        rot = (jnp.arange(n)[:, None] + jnp.arange(n)[None, :]) % n  # (N, N)
        gathered = feats[:, rot]  # (B, N, N, h, w, C)
        bsz, _, _, h, w, c = gathered.shape
        fused = jnp.moveaxis(gathered, 2, -2).reshape(bsz, n, h, w, n * c)
        return decoder(_fold_agents(fused), bn)


class LearnWho2Com(nn.Module):
    """SRMS who2com: agent 0 is the degraded requester; keys come from the
    four supporters only, the query from agent 0; attention picks a supporter
    and the decoder sees concat(own, fused) (reference: agent.py:472-673).
    """

    n_classes: int = 11
    feat_channel: int = 512
    feat_squeezer: int = -1
    attention: str = "general"
    has_query: bool = True
    sparse: bool = False
    agent_num: int = 5
    shared_img_encoder: Any = "unified"  # 'unified'|'only_normal_agents'|other
    key_size: int = 1024
    query_size: int = 8
    enc_backbone: str = "resnet_encoder"
    dec_backbone: str = "simple_decoder"
    dtype: Any = None

    def _encode(self, x, bn):
        b, n = x.shape[0], x.shape[1]
        mk = lambda name: ImgEncoder(
            self.feat_channel, self.feat_squeezer, self.enc_backbone,
            dtype=self.dtype, name=name
        )
        if self.shared_img_encoder == "unified":
            return _unfold_agents(mk("u_encoder")(_fold_agents(x), bn), n)
        if self.shared_img_encoder == "only_normal_agents":
            own = mk("degraded_encoder")(x[:, 0], bn)
            rest = _unfold_agents(mk("normal_encoder")(_fold_agents(x[:, 1:]), bn), n - 1)
            return jnp.concatenate([own[:, None], rest], axis=1)
        feats = [mk(f"encoder{i + 1}")(x[:, i], bn) for i in range(n)]
        return jnp.stack(feats, axis=1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 inference: str = "argmax", bn_train: bool | None = None):
        bn = train if bn_train is None else bn_train
        b, n = x.shape[0], x.shape[1]
        feats = self._encode(x, bn)  # (B, N, h, w, C)
        qk_map = PolicyNet4(self.enc_backbone, dtype=self.dtype)(_fold_agents(x), bn)
        qk_map = _unfold_agents(qk_map, n)  # (B, N, h', w', 256)

        keys = KMGenerator(self.key_size, dtype=self.dtype,
                           name="key_net")(_fold_agents(qk_map[:, 1:]))
        keys = _unfold_agents(keys, n - 1)  # (B, N-1, key)
        if self.has_query:
            query = KMGenerator(self.query_size, dtype=self.dtype,
                                name="query_net")(qk_map[:, 0])[:, None]
        else:
            query = jnp.ones((b, 1, self.query_size), dtype=feats.dtype)

        vals = feats[:, 1:]  # supporters only
        attn = get_srms_attention(self.attention, self.query_size, self.key_size,
                                  self.sparse, dtype=self.dtype)
        fused, prob_action = attn(query, keys, vals)  # (B,h,w,C), (B,1,N-1)

        decoder = ImgDecoder(self.n_classes, self.feat_squeezer,
                             self.dec_backbone, dtype=self.dtype)
        action = jnp.argmax(prob_action, axis=2)

        if train or inference == "softmax":
            pred = decoder(jnp.concatenate([feats[:, 0], fused], axis=-1), bn)
            return pred, prob_action, action
        if inference == "argmax_test":
            # Hard top-1 supporter via one-hot matmul (replaces the per-sample
            # branch loop at agent.py:633-648), detached like the reference.
            coef = one_hot_argmax(jnp.swapaxes(prob_action, 1, 2), axis=1)
            aux = fuse_values(coef, vals)[:, 0]
            cat = jnp.concatenate(
                [jax.lax.stop_gradient(feats[:, 0]), jax.lax.stop_gradient(aux)], axis=-1
            )
            pred = decoder(cat, bn)
            return pred, prob_action, action
        raise ValueError(f"Incorrect inference mode {inference!r}")


class LearnWhen2Com(nn.Module):
    """SRMS when2com: keys from all five agents *including self* — attending
    to yourself means "don't communicate". The decoder sees only the fused map
    (reference: agent.py:676-889).

    Inference modes: 'softmax' (full soft fusion), 'argmax_test' (hard top-1),
    'activated' (prune links with attention <= 0.2); the latter two report the
    ``num_connect`` bandwidth statistic.
    """

    n_classes: int = 11
    feat_channel: int = 512
    feat_squeezer: int = -1
    attention: str = "general"
    has_query: bool = True
    sparse: bool = False
    agent_num: int = 5
    shared_img_encoder: Any = "unified"
    key_size: int = 1024
    query_size: int = 8
    enc_backbone: str = "resnet_encoder"
    dec_backbone: str = "simple_decoder"
    dtype: Any = None

    _encode = LearnWho2Com._encode

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 inference: str = "argmax", bn_train: bool | None = None):
        bn = train if bn_train is None else bn_train
        b, n = x.shape[0], x.shape[1]
        feats = self._encode(x, bn)  # (B, N, h, w, C)
        qk_map = _unfold_agents(
            PolicyNet4(self.enc_backbone, dtype=self.dtype)(_fold_agents(x), bn), n)

        keys = _unfold_agents(
            KMGenerator(self.key_size, dtype=self.dtype,
                        name="key_net")(_fold_agents(qk_map)), n
        )  # keys from all N incl. self (agent.py:842-847)
        if self.has_query:
            query = KMGenerator(self.query_size, dtype=self.dtype,
                                name="query_net")(qk_map[:, 0])[:, None]
        else:
            query = jnp.ones((b, 1, self.query_size), dtype=feats.dtype)

        attn = get_srms_attention(self.attention, self.query_size, self.key_size,
                                  self.sparse, dtype=self.dtype)
        fused, prob_action = attn(query, keys, feats)  # (B,h,w,C), (B,1,N)

        decoder = ImgDecoder(self.n_classes, self.feat_squeezer,
                             self.dec_backbone, dtype=self.dtype)
        action = jnp.argmax(prob_action, axis=2)

        if train:
            return decoder(fused, bn), prob_action, action
        if inference == "softmax":
            return decoder(fused, bn), prob_action, action, jnp.float32(n - 1)
        if inference == "argmax_test":
            coef = one_hot_argmax(jnp.swapaxes(prob_action, 1, 2), axis=1)  # (B,N,1)
            feat_argmax = fuse_values(coef, feats)[:, 0]
            # num_connect: fraction of samples that picked a non-self link
            # (reference: agent.py:775-798).
            num_connect = jnp.mean((action[:, 0] != 0).astype(jnp.float32))
            pred = decoder(jax.lax.stop_gradient(feat_argmax), bn)
            return pred, prob_action, action, num_connect
        if inference == "activated":
            w = prob_action  # (B, 1, N)
            act = jnp.where(w > 0.2, w, 0.0)
            coef = jnp.swapaxes(act, 1, 2)  # (B, N, 1)
            feat_act = fuse_values(coef, feats)[:, 0]
            # links to non-self agents per sample (agent.py:800-809)
            num_connect = jnp.sum(act[:, :, 1:] != 0).astype(jnp.float32) / b
            pred = decoder(jax.lax.stop_gradient(feat_act), bn)
            # third output is the activated weight matrix, matching the
            # reference contract (agent.py:866-869: pred, prob, action, nc
            # where action == thresholded W)
            return pred, prob_action, act, num_connect
        raise ValueError(f"Incorrect inference mode {inference!r}")


class MIMOcom(nn.Module):
    """The when2com MRMS model (reference: agent.py:983-1204).

    Unified encoder over all N agents batched; policy_net4 + km_generator
    produce per-agent query(32)/key(1024); MIMO attention yields the NxN
    graph; fused per-agent maps are folded back into the batch and decoded.
    A +0.001*I diagonal bias nudges agents toward their own frames
    (agent.py:1164-1167).

    ``inference='topk'`` adds the bandwidth-constrained top-k pruned graph
    (not in the reference; BASELINE.json's bandwidth-constrained variant).
    ``use_pallas_comm`` (config ``model.pallas_comm``) routes the
    argmax_test/activated eval paths through the fused single-pass Pallas
    kernel (ops/pallas/comm_fusion.py). Numerically equivalent; standalone
    the kernel is ~4x faster than the unfused XLA selection, in the full
    model it is performance-neutral (the conv towers dominate and XLA fuses
    the comm step in context) — kept as the serving-build option.

    ``agent_mesh``: a Mesh with an 'agent' axis enables large-N scaling —
    the eval fusion runs as a ring over ICI (parallel/ring.py) with value
    maps sharded by agent, never materializing the full (B, N, h, w, C)
    tensor per device. Numerically equal to the dense path (tests/test_ring).
    """

    n_classes: int = 11
    feat_channel: int = 512
    feat_squeezer: int = -1
    attention: str = "general"
    has_query: bool = True
    sparse: bool = False
    agent_num: int = 6
    shared_img_encoder: Any = "unified"
    key_size: int = 1024
    query_size: int = 32
    enc_backbone: str = "resnet_encoder"
    dec_backbone: str = "simple_decoder"
    topk_k: int = 2
    dtype: Any = None
    use_pallas_comm: bool = False
    agent_mesh: Any = None  # Mesh with an 'agent' axis: ring-fused comm
    ring_train: bool = False  # differentiate through the ring: the TRAIN
    # step's softmax fusion also runs agent-sharded (config
    # model.agent_parallel_train; equivalence vs dense in tests/test_ring.py)
    remat: bool = False  # rematerialize the two encoder towers (trade FLOPs
    # for activation memory on large batches; jax.checkpoint semantics)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        mo_flag: bool = True,
        inference: str = "argmax",
        bn_train: bool | None = None,
    ):
        if self.shared_img_encoder != "unified":
            raise ValueError("Incorrect encoder")
        bn = train if bn_train is None else bn_train
        b, n = x.shape[0], x.shape[1]
        flat = _fold_agents(x)
        # static_argnums: (self, x, bn) -> bn selects BN mode, static
        enc_cls = (
            nn.remat(ImgEncoder, static_argnums=(2,)) if self.remat else ImgEncoder
        )
        pol_cls = (
            nn.remat(PolicyNet4, static_argnums=(2,)) if self.remat else PolicyNet4
        )
        val_mat = _unfold_agents(
            enc_cls(self.feat_channel, self.feat_squeezer, self.enc_backbone,
                    dtype=self.dtype, name="u_encoder")(flat, bn),
            n,
        )  # (B, N, h, w, C) — value pass, separate weights from the policy pass
        qk_map = pol_cls(self.enc_backbone, dtype=self.dtype,
                         name="query_key_net")(flat, bn)
        key_mat = _unfold_agents(
            KMGenerator(self.key_size, dtype=self.dtype, name="key_net")(qk_map), n)
        if self.has_query:
            query_mat = _unfold_agents(
                KMGenerator(self.query_size, dtype=self.dtype,
                            name="query_net")(qk_map), n
            )
        else:
            query_mat = jnp.ones((b, n, self.query_size), dtype=val_mat.dtype)
        if not mo_flag:
            query_mat = query_mat[:, :1]

        attn = MIMOGeneralDotAttention(self.key_size, self.sparse, dtype=self.dtype)
        decoder = ImgDecoder(self.n_classes, self.feat_squeezer,
                             self.dec_backbone, dtype=self.dtype)
        mo = query_mat.shape[1] == n

        # Agent-sharded ring path for large N (full graph required): values
        # stay sharded over the 'agent' mesh axis, fusion rotates shards
        # over ICI (parallel/ring.py). Eval covers the three full-graph
        # modes; with ring_train the TRAIN forward's softmax fusion also
        # runs here — jax differentiates the shard_map ring (the transposed
        # program is the reverse ring), so value_and_grad works through it.
        if (
            self.agent_mesh is not None
            and mo
            and (
                (not train
                 and inference in ("softmax", "argmax_test", "activated"))
                or (train and self.ring_train and inference == "softmax")
            )
        ):
            from multiagentperception_tpu.parallel.ring import sharded_comm_step

            mode = {"softmax": "softmax", "argmax_test": "argmax",
                    "activated": "activated"}[inference]
            feat, coef, soft = sharded_comm_step(
                attn.project(query_mat), key_mat, val_mat, self.agent_mesh,
                mode=mode, diag_bias=0.001,
            )
            flat_feat = _fold_agents(feat)
            if inference == "softmax":
                pred2 = decoder(flat_feat, bn)
                num_connect = jnp.float32(n - 1)
            else:
                pred2 = decoder(jax.lax.stop_gradient(flat_feat), bn)
                num_connect = num_connect_offdiag(coef, n)
            return pred2, soft, jnp.argmax(coef, axis=1), num_connect

        # Fused Pallas eval path: softmax + diag bias + mode mask + value
        # fusion in one VMEM pass (eval only — the masked modes are
        # stop-gradient anyway; requires the full NxN graph, i.e. MO).
        if (
            self.use_pallas_comm
            and not train
            and mo
            and inference in ("argmax_test", "activated")
        ):
            mode = "argmax" if inference == "argmax_test" else "activated"
            feat, coef, prob_action = fused_comm_step(
                attn.project(query_mat), key_mat, val_mat,
                mode=mode, diag_bias=0.001,
            )
            num_connect = num_connect_offdiag(coef, n)
            pred2 = decoder(jax.lax.stop_gradient(_fold_agents(feat)), bn)
            action = jnp.argmax(coef, axis=1)
            return pred2, prob_action, action, num_connect

        feat_fuse, prob_action = attn(query_mat, key_mat, val_mat)  # (B,Q,h,w,C), (B,K,Q)
        pred = decoder(_fold_agents(feat_fuse), bn)

        # prefer-own-frame diagonal bias (agent.py:1164-1167; the reference
        # constructs eye(K) so this only type-checks when K == Q, i.e. MO).
        if prob_action.shape[1] == prob_action.shape[2]:
            prob_action = prob_action + 0.001 * jnp.eye(
                prob_action.shape[1], dtype=prob_action.dtype
            )[None]

        action = jnp.argmax(prob_action, axis=1)
        if train or inference == "softmax":
            return pred, prob_action, action, jnp.float32(n - 1)
        if inference == "argmax_test":
            feat, coef, num_connect = argmax_select(val_mat, prob_action, n)
            pred2 = decoder(jax.lax.stop_gradient(_fold_agents(feat)), bn)
            return pred2, prob_action, jnp.argmax(coef, axis=1), num_connect
        if inference == "activated":
            feat, coef, num_connect = activated_select(val_mat, prob_action, n)
            pred2 = decoder(jax.lax.stop_gradient(_fold_agents(feat)), bn)
            return pred2, prob_action, jnp.argmax(coef, axis=1), num_connect
        if inference == "topk":
            feat, coef, num_connect = topk_select(val_mat, prob_action, n, self.topk_k)
            pred2 = decoder(jax.lax.stop_gradient(_fold_agents(feat)), bn)
            return pred2, prob_action, jnp.argmax(coef, axis=1), num_connect
        raise ValueError(f"Incorrect inference mode {inference!r}")


class MIMOcomWho(nn.Module):
    """MRMS who2com (always-communicate baseline): diagonal-deleted attention;
    the decoder input is concat(fused, own) = 2*feat_channel
    (reference: agent.py:1207-1423)."""

    n_classes: int = 11
    feat_channel: int = 512
    feat_squeezer: int = -1
    attention: str = "general"
    has_query: bool = True
    sparse: bool = False
    agent_num: int = 6
    shared_img_encoder: Any = "unified"
    key_size: int = 1024
    query_size: int = 32
    enc_backbone: str = "resnet_encoder"
    dec_backbone: str = "simple_decoder"
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        mo_flag: bool = True,
        inference: str = "argmax",
        bn_train: bool | None = None,
    ):
        if self.shared_img_encoder != "unified":
            raise ValueError("Incorrect shared_img_encoder flag")
        bn = train if bn_train is None else bn_train
        b, n = x.shape[0], x.shape[1]
        flat = _fold_agents(x)
        val_mat = _unfold_agents(
            ImgEncoder(self.feat_channel, self.feat_squeezer, self.enc_backbone,
                       dtype=self.dtype, name="u_encoder")(flat, bn),
            n,
        )
        qk_map = PolicyNet4(self.enc_backbone, dtype=self.dtype,
                            name="query_key_net")(flat, bn)
        key_mat = _unfold_agents(
            KMGenerator(self.key_size, dtype=self.dtype, name="key_net")(qk_map), n)
        if self.has_query:
            query_mat = _unfold_agents(
                KMGenerator(self.query_size, dtype=self.dtype,
                            name="query_net")(qk_map), n
            )
        else:
            query_mat = jnp.ones((b, n, self.query_size), dtype=val_mat.dtype)
        if not mo_flag:
            query_mat = query_mat[:, :1]

        attn = MIMOWhoGeneralDotAttention(self.key_size, self.sparse, dtype=self.dtype)
        feat_fuse, prob_action = attn(query_mat, key_mat, val_mat)

        decoder = ImgDecoder(self.n_classes, self.feat_squeezer,
                             self.dec_backbone, dtype=self.dtype)
        fuse_map = jnp.concatenate([feat_fuse, val_mat], axis=-1)
        pred = decoder(_fold_agents(fuse_map), bn)

        action = jnp.argmax(prob_action, axis=1)
        if train or inference == "softmax":
            return pred, prob_action, action, jnp.float32(n - 1)
        if inference == "argmax_test":
            feat, coef, num_connect = argmax_select(val_mat, prob_action, n)
            cat = jnp.concatenate([feat, val_mat], axis=-1)
            pred2 = decoder(jax.lax.stop_gradient(_fold_agents(cat)), bn)
            return pred2, prob_action, action, num_connect
        if inference == "activated":
            feat, coef, num_connect = activated_select(val_mat, prob_action, n)
            cat = jnp.concatenate([feat, val_mat], axis=-1)
            pred2 = decoder(jax.lax.stop_gradient(_fold_agents(cat)), bn)
            return pred2, prob_action, action, num_connect
        raise ValueError(f"Incorrect inference mode {inference!r}")

"""multiagentperception_tpu — TPU-native multi-agent collaborative perception.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
GT-RIPL/MultiAgentPerception (When2com, CVPR 2020): N camera agents encode
their views, exchange learned query/key handshakes to decide *when* and *with
whom* to communicate, fuse feature maps along the learned communication graph,
and decode per-agent semantic segmentation.

Unlike the reference (per-agent Python loops + nn.DataParallel), every
multi-agent step here is one fused XLA program: the agent axis is batched into
the leading dim for conv towers and contracted with a single (B, N, N)
attention einsum on the MXU; data parallelism is pjit sharding over a
`jax.sharding.Mesh`.

Public surface mirrors the reference's config-driven registries
(reference: ptsemseg/models/__init__.py:89-101, loss/__init__.py:13-17, ...).
"""

__version__ = "0.1.0"

"""Compat helpers mirroring reference utilities that have no TPU analogue.

``convert_state_dict`` (reference utils.py:100-109) strips torch
DataParallel's ``module.`` prefix; pjit sharding never prefixes parameter
names, so the TPU version is an identity with prefix-strip support for
anyone feeding dicts that carry one.
"""

from __future__ import annotations

from collections import OrderedDict


def convert_state_dict(state_dict):
    """Strip a leading 'module.' from keys when present (no-op otherwise)."""
    out = OrderedDict()
    for k, v in state_dict.items():
        out[k[7:] if k.startswith("module.") else k] = v
    return out

"""Checkpointing + the ckpt_paths resume protocol.

The reference's public checkpoint protocol (README.md:9-13,
train.py:144-159,176-222): training appends each saved path to
`ckpt_paths/{experiment}.txt`; resume and tests load the LAST line.
Kept verbatim here. The payload is a flax-serialized pytree
{params, opt_state, epoch} (.msgpack) instead of a torch pickle.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, params: Any, opt_state: Any, epoch: int,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "opt_state": jax.tree.map(np.asarray, opt_state),
        "meta": {"epoch": epoch, **(extra or {})},
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_checkpoint(path: str, params_template: Any,
                    opt_state_template: Any = None
                    ) -> Tuple[Any, Any, Dict[str, Any]]:
    """Restore params + meta; opt_state comes back as None when it does
    not fit `opt_state_template` (e.g. resuming into a stage with a
    different optimizer — the reference tolerates this the same way by
    re-creating the optimizer, train.py:238-242)."""
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(params_template,
                                           state["params"])
    meta = dict(state.get("meta", {}))
    meta.setdefault("epoch", 0)
    opt_state = None
    if opt_state_template is not None and state.get("opt_state") is not None:
        try:
            opt_state = serialization.from_state_dict(
                opt_state_template, state["opt_state"])
        except Exception:
            opt_state = None     # stage optimizer changed; start fresh
    return params, opt_state, meta


def load_params_only(path: str, params_template: Any) -> Any:
    """Tests load with strict=False (test_e2vid.py:188); here: restore
    params subtree only, tolerating a missing/foreign opt_state."""
    with open(path, "rb") as f:
        data = f.read()
    state = serialization.msgpack_restore(data)
    return serialization.from_state_dict(params_template, state["params"])


def ckpt_paths_file(experiment_name: str, root: str = ".") -> str:
    return os.path.join(root, "ckpt_paths", f"{experiment_name}.txt")


def last_ckpt_path(experiment_name: str, root: str = ".") -> Optional[str]:
    """Last non-empty line, or None (train.py:176-188)."""
    pf = ckpt_paths_file(experiment_name, root)
    if not (os.path.exists(pf) and os.path.getsize(pf) > 0):
        os.makedirs(os.path.dirname(pf), exist_ok=True)
        open(pf, "a").close()
        return None
    with open(pf) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    return lines[-1] if lines else None


def all_ckpt_paths(experiment_name: str, root: str = ".") -> list:
    pf = ckpt_paths_file(experiment_name, root)
    if not os.path.exists(pf):
        return []
    with open(pf) as f:
        return [ln.strip() for ln in f if ln.strip()]


def append_ckpt_path(experiment_name: str, path: str, root: str = ".") -> None:
    pf = ckpt_paths_file(experiment_name, root)
    os.makedirs(os.path.dirname(pf), exist_ok=True)
    with open(pf, "a") as f:
        f.write(path + "\n")

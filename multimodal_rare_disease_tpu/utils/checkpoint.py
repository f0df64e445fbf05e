"""Orbax checkpointing with best/last roles.

Replaces the reference's `torch.save` dict checkpoints
(`src/train.py:394-437`, `src/train_multimodal.py:624-664`): an orbax
array tree ({params, batch_stats, step}) plus a JSON sidecar carrying
epoch, best metric, training history, and the resolved config — the same
information content, restorable without pickle.

Roles: `{mode}_best` / `{mode}_last` (ref files `{mode}_best.pt`,
`{mode}_last.pt`, `best_model.pt`, `multimodal_best.pt`).
`load_checkpoint` accepts either role dir or an explicit path.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_ARRAYS_SUBDIR = "arrays"
_META_FILE = "meta.json"


def _checkpointer() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(
    path: str | Path,
    params: Any,
    batch_stats: Any,
    step: int,
    meta: Optional[Dict[str, Any]] = None,
    opt_state: Any = None,
) -> None:
    """Write/overwrite a checkpoint directory. `opt_state` (optimizer
    moments) is included for resumable "last" checkpoints — parity with
    the reference's optimizer_state_dict (`src/train.py:394-422`).

    Crash-safe: the new checkpoint is fully written to a sibling `.tmp`
    directory first, then swapped in via two renames. Directory swaps
    cannot be a single atomic rename, so a crash between the two
    renames can leave `path` briefly absent with the data intact in the
    `.old` sibling — `load_checkpoint` falls back to `.old` (and `.tmp`)
    in that case, so no committed checkpoint is ever lost."""
    path = Path(path).absolute()
    tmp = path.with_name(path.name + ".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    tree = {
        "params": jax.tree_util.tree_map(np.asarray, params),
        "batch_stats": jax.tree_util.tree_map(np.asarray, batch_stats),
    }
    if opt_state is not None:
        tree["opt_state"] = jax.tree_util.tree_map(np.asarray, opt_state)
    ckptr = _checkpointer()
    ckptr.save(tmp / _ARRAYS_SUBDIR, tree)
    ckptr.wait_until_finished()
    with open(tmp / _META_FILE, "w", encoding="utf-8") as f:
        json.dump({"step": int(step), **(meta or {})}, f, indent=2, default=str)
    if path.exists():
        old = path.with_name(path.name + ".old")
        if old.exists():
            shutil.rmtree(old)
        os.replace(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old)
    else:
        os.replace(tmp, path)


def load_checkpoint(path: str | Path) -> Tuple[Any, Any, Dict[str, Any]]:
    """→ (params, batch_stats, meta).

    If `path` is missing but a `.old` / `.tmp` sibling holds a complete
    checkpoint (a crash landed between save_checkpoint's two directory
    renames), recover from the sibling."""
    path = Path(path).absolute()
    if not (path / _ARRAYS_SUBDIR).exists():
        for suffix in (".old", ".tmp"):
            sib = path.with_name(path.name + suffix)
            if (sib / _ARRAYS_SUBDIR).exists() and (sib / _META_FILE).exists():
                path = sib
                break
        else:
            raise FileNotFoundError(f"no checkpoint at {path}")
    ckptr = _checkpointer()
    tree = ckptr.restore(path / _ARRAYS_SUBDIR)
    meta: Dict[str, Any] = {}
    if (path / _META_FILE).exists():
        with open(path / _META_FILE, encoding="utf-8") as f:
            meta = json.load(f)
    if "opt_state" in tree:
        meta["_opt_state"] = tree["opt_state"]
    return _migrate_params(tree["params"]), tree.get("batch_stats", {}), meta


def _migrate_params(params: Any) -> Any:
    """Forward-migrate older checkpoint layouts.

    v0 → v1: BERT attention used separate query/key/value DenseGenerals;
    current layout is one fused qkv kernel [H, 3, heads, d]."""
    if not isinstance(params, dict):
        return params
    out = {}
    for k, v in params.items():
        if isinstance(v, dict) and {"query", "key", "value"} <= set(v) \
                and "qkv" not in v and "output" in v:
            q, kk, vv = v["query"], v["key"], v["value"]
            out[k] = {
                "qkv": {
                    "kernel": np.stack([np.asarray(q["kernel"]),
                                        np.asarray(kk["kernel"]),
                                        np.asarray(vv["kernel"])], axis=1),
                    "bias": np.stack([np.asarray(q["bias"]),
                                      np.asarray(kk["bias"]),
                                      np.asarray(vv["bias"])], axis=0),
                },
                "output": _migrate_params(v["output"]),
            }
        else:
            out[k] = _migrate_params(v)
    return out


def checkpoint_exists(path: str | Path) -> bool:
    return (Path(path) / _ARRAYS_SUBDIR).exists()


def role_path(checkpoint_dir: str | Path, mode: str, role: str) -> Path:
    """best/last role path for a training mode."""
    return Path(checkpoint_dir) / f"{mode}_{role}"

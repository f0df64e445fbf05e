"""Checkpoint crash-recovery semantics (advisor r2: a crash between
save_checkpoint's two directory renames must not lose the checkpoint)."""

import os

import numpy as np
import pytest

from multimodal_rare_disease_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)


def _params(val):
    return {"dense": {"kernel": np.full((2, 2), val, np.float32)}}


def test_save_load_roundtrip(tmp_path):
    path = tmp_path / "ckpt"
    save_checkpoint(path, _params(1.0), {}, step=3, meta={"mode": "m"})
    params, bs, meta = load_checkpoint(path)
    assert meta["step"] == 3 and meta["mode"] == "m"
    np.testing.assert_array_equal(params["dense"]["kernel"],
                                  _params(1.0)["dense"]["kernel"])


def test_load_falls_back_to_old_sibling(tmp_path):
    """Simulate a crash after os.replace(path, old) but before
    os.replace(tmp, path): `path` missing, data intact in `.old`."""
    path = tmp_path / "ckpt"
    save_checkpoint(path, _params(2.0), {}, step=7, meta={})
    os.replace(path, tmp_path / "ckpt.old")  # the crash window
    params, _, meta = load_checkpoint(path)
    assert meta["step"] == 7
    np.testing.assert_array_equal(params["dense"]["kernel"],
                                  _params(2.0)["dense"]["kernel"])


def test_load_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_checkpoint(tmp_path / "nope")

"""Shared CLI plumbing."""

from __future__ import annotations

import argparse
import ast
import logging
import os
from typing import Any, Dict, List, Optional

from multimodal_rare_disease_tpu.config import Config, resolve_config


def setup_logging(verbose: bool = True) -> None:
    logging.basicConfig(
        level=logging.INFO if verbose else logging.WARNING,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        datefmt="%H:%M:%S",
    )


def enable_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    Every CLI entry point is a fresh process, and the flagship
    predictor/evaluator costs minutes of XLA compile cold — so without
    a persistent cache a notebook or shell script that chains CLI calls
    re-pays that compile per invocation. The cache keys on optimized
    HLO + compile options, so it is exact across processes. An explicit
    JAX_COMPILATION_CACHE_DIR is honored; MRD_NO_COMPILE_CACHE=1
    disables (e.g. for compile-time benchmarking).
    """
    if os.environ.get("MRD_NO_COMPILE_CACHE") == "1":
        return
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "mrd_jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Bound the cache: JAX never evicts on its own, and chained CLI
        # runs across configs/shapes would otherwise grow it forever.
        # NOT via jax_compilation_cache_max_size — with that set, JAX's
        # eviction expects an `-atime` companion per entry, and on a dir
        # holding entries written before the bound existed every
        # subsequent write fails with FileNotFoundError (measured here:
        # the cache silently stopped warming). Trim oldest-first
        # ourselves instead when the dir exceeds 4 GiB.
        _trim_cache_dir(path, max_bytes=4 << 30)
    except Exception:  # the cache is an optimization, never a failure
        logging.getLogger(__name__).debug(
            "compilation cache unavailable", exc_info=True)


def _trim_cache_dir(path: str, max_bytes: int) -> None:
    """Best-effort LRU-ish bound: if the cache dir exceeds ``max_bytes``,
    delete oldest-modified files until it is under half the bound."""
    entries = []
    total = 0
    with os.scandir(path) as it:
        for e in it:
            if not e.is_file():
                continue
            st = e.stat()
            entries.append((st.st_mtime, st.st_size, e.path))
            total += st.st_size
    if total <= max_bytes:
        return
    entries.sort()
    for _, size, p in entries:
        try:
            os.unlink(p)
        except OSError:
            continue
        total -= size
        if total <= max_bytes // 2:
            break


def configure_platform(platform: Optional[str] = None) -> None:
    """Pin the JAX platform before first backend use.

    Role parity with the reference's `get_safe_device()`
    (`src/train.py:30-51`): an explicit escape hatch when the
    accelerator is unreachable. Resolution order: the `--platform` flag,
    then the MRD_PLATFORM env var, then JAX's configured default (the
    TPU where available). Needed because some images pre-configure
    `jax_platforms='axon,cpu'` at a level the JAX_PLATFORMS env var
    does not override — and a dead TPU tunnel hangs backend creation
    rather than erroring, so in-process probing is not an option (see
    `probe_default_backend` for the subprocess probe).
    """
    enable_compilation_cache()
    choice = platform or os.environ.get("MRD_PLATFORM")
    if not choice or choice == "auto":
        return
    if choice == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    # "tpu": keep JAX's default platform priority — the accelerator
    # platform name varies by environment ('tpu', or 'axon' under the
    # tunnel), and the default already prefers it where registered.


def probe_default_backend(timeout_s: float = 120.0) -> Dict[str, Any]:
    """Probe JAX's default backend in a SUBPROCESS with a timeout.

    A dead accelerator tunnel makes `jax.devices()` hang indefinitely
    inside PJRT client creation (holding jax's backend lock, so a
    same-process thread probe would wedge the process too). The
    subprocess is killable; the parent's backend state is untouched.
    Returns {"ok": bool, "devices": str | None, "error": str | None}.
    """
    import subprocess
    import sys

    code = ("import jax; d = jax.devices(); "
            "print(f'{len(d)}x {d[0].platform}:{d[0].device_kind}')")
    try:
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"ok": False, "devices": None,
                "error": f"backend init hung >{timeout_s:.0f}s "
                         "(accelerator tunnel down?)"}
    if res.returncode != 0:
        return {"ok": False, "devices": None,
                "error": (res.stderr or "").strip()[-500:]}
    return {"ok": True, "devices": res.stdout.strip().splitlines()[-1],
            "error": None}


def add_config_args(parser: argparse.ArgumentParser) -> None:
    from multimodal_rare_disease_tpu.config import PRESETS

    # choices derive from the PRESETS registry so a preset added in
    # config.py is immediately reachable from every CLI (a hardcoded
    # list silently rejected `from_scratch_fullsize` when it landed).
    parser.add_argument("--preset", default=None,
                        choices=sorted(PRESETS),
                        help="config preset (default: inferred from mode)")
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="config override, e.g. --set training.batch_size=16")
    add_platform_arg(parser)


def add_platform_arg(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--platform", default=None,
                        choices=["auto", "cpu", "tpu"],
                        help="JAX platform: auto (default; honors "
                             "MRD_PLATFORM env), cpu (run without the "
                             "accelerator, e.g. when the TPU tunnel is "
                             "down), tpu")


def build_config(args: argparse.Namespace, mode: str,
                 extra: Optional[Dict[str, Any]] = None) -> Config:
    preset = args.preset
    if preset is None:
        preset = {"multimodal": "multimodal", "image_only": "small_data",
                  "text_only": "default"}.get(mode, "default")
    overrides: Dict[str, Any] = dict(extra or {})
    for item in getattr(args, "overrides", []):
        if "=" not in item:
            raise SystemExit(f"--set expects KEY=VALUE, got {item!r}")
        key, value = item.split("=", 1)
        try:
            overrides[key] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            overrides[key] = value
    return resolve_config(preset, overrides)

"""Pallas capability probe (ops/pallas/capability.py).

Regression for the round-4 bug: the probe's first call can come from
INSIDE a jit trace (the trainer's jitted model init traces BertLayer ->
_fused_ffn_engaged -> pallas_available). Before the
ensure_compile_time_eval fix, the tracer hit `float()`, raised, and
Pallas was cached off for the whole process — silently downgrading the
serving path of any process that trained first.
"""

import jax
import jax.numpy as jnp
import pytest

import multimodal_rare_disease_tpu.ops.pallas.capability as cap

pytestmark = pytest.mark.smoke


def test_probe_inside_trace_matches_outside():
    cap._PALLAS_OK = None
    outside = cap.pallas_available()

    cap._PALLAS_OK = None
    seen = {}

    def f(x):
        seen["inside"] = cap.pallas_available()
        return x * 2

    jax.jit(f)(jnp.ones(3))
    assert seen["inside"] == outside
    # and the cached value after an in-trace first call equals the
    # eager answer (the bug cached False)
    assert cap._PALLAS_OK == outside


def test_probe_result_cached_once():
    cap._PALLAS_OK = None
    a = cap.pallas_available()
    b = cap.pallas_available()
    assert a == b == cap._PALLAS_OK

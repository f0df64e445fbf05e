"""End-to-end packed-inference measurement on the real corpus.

Same workload and harness as bench.py (real PNGs + clinical
descriptions, eval_preprocess inside the step, K-fold carry-chained
scan), but the text tower runs the sequence-packed path
(inference/packing.py): ~2.8 docs per 256-token row vs one doc per
128-token row.

Run: PYTHONPATH=/root/repo:/root/.axon_site python artifacts/bench_packed.py
Env: CAP (capacity, default 256), BENCH_B (docs per batch, default 256)
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.inference.packing import pack_texts
from multimodal_rare_disease_tpu.models import create_model
from multimodal_rare_disease_tpu.ops.preprocess import eval_preprocess

import bench as bench_mod

B = int(os.environ.get("BENCH_B", "256"))
CAP = int(os.environ.get("CAP", "256"))
K = 96


def main():
    cfg = resolve_config("default")
    dtype = jnp.bfloat16
    model = create_model(cfg, mode="multimodal", dtype=dtype)
    S = 256
    images_np, ids_np, mask_np = bench_mod._real_corpus_batch(cfg, B, S)
    pb = pack_texts(ids_np, mask_np, capacity=CAP)
    print(f"packed: {B} docs -> {pb.num_rows} rows x {CAP} "
          f"({pb.tokens_per_doc:.0f} tokens/doc vs {ids_np.shape[1]})",
          flush=True)

    images = jnp.asarray(images_np)
    args = tuple(jnp.asarray(a) for a in (
        pb.input_ids, pb.position_ids, pb.segment_ids,
        pb.query_positions, pb.doc_row, pb.doc_slot))

    variables = model.init(jax.random.key(0),
                           eval_preprocess(images[:1], cfg, dtype=dtype),
                           jnp.asarray(ids_np[:1]), jnp.asarray(mask_np[:1]),
                           train=False)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        variables)

    @jax.jit
    def stream(variables, images_u8, packed_k):
        # the packed text arrays are scanned alongside the images —
        # otherwise they are loop-invariant and XLA hoists the entire
        # text tower out of the K-loop (first run of this harness
        # measured 23 ms/batch for exactly that reason)
        def body(carry, xs):
            img, packed = xs
            x = eval_preprocess(img, cfg, dtype=dtype)
            out = model.apply(variables, x, *packed,
                              method="packed_forward")
            return carry + jnp.sum(out["probs"]), ()
        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                (images_u8, packed_k))
        return total

    imgs_k = jnp.broadcast_to(images, (K,) + images.shape)
    packed_k = tuple(jnp.broadcast_to(a, (K,) + a.shape) for a in args)
    float(stream(variables, imgs_k, packed_k))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(stream(variables, imgs_k, packed_k))
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts))
    print(f"packed CAP={CAP}: p50 {p50/K*1000:.2f} ms/batch-{B} -> "
          f"{K*B/p50:.1f} pairs/s", flush=True)

    # sanity: packed probs match the classic path on this real batch
    classic = model.apply(variables, eval_preprocess(images, cfg,
                                                     dtype=dtype),
                          jnp.asarray(ids_np), jnp.asarray(mask_np),
                          train=False)["probs"]
    packed = model.apply(variables, eval_preprocess(images, cfg,
                                                    dtype=dtype),
                         *args, method="packed_forward")["probs"]
    d = float(jnp.abs(classic - packed).max())
    print(f"max|packed - classic| probs (bf16): {d:.5f}", flush=True)


if __name__ == "__main__":
    main()

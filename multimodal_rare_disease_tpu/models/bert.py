"""BERT-base clinical text encoder, TPU-native.

Architecture-compatible with the reference's HF `AutoModel` BERT encoders
(BioBERT / ClinicalBERT / PubMedBERT, `src/text_encoder.py:27-239`):
word+position+segment embeddings → 12 post-LN transformer layers → CLS
token (default) or tanh pooler. Converted HF checkpoints load directly
into this module's param tree (see `models/convert.py`).

All shapes are static (pad-to-max tokenization), attention is the
standard XLA softmax(QK^T/sqrt(d))V which maps straight onto the MXU in
bf16; per-layer attention probabilities are exposed for the
explainability path (ref `src/text_encoder.py:151-179`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from multimodal_rare_disease_tpu.config import TextEncoderConfig

Dtype = Any

# HF BertModel init semantics (`_init_weights`): every Linear/Embedding
# weight ~ N(0, initializer_range=0.02), biases zero, LayerNorm 1/0.
# This matters beyond cosmetics: with flax defaults (lecun_normal
# kernels, Embed stddev 1.0) a from-scratch post-LN BERT stops training
# at >=4 layers with the 3072-wide FFN (loss pinned at ln(num_classes));
# the small-residual-branch N(0, 0.02) init restores HF's from-scratch
# trainability.
_HF_INIT = nn.initializers.normal(stddev=0.02)


class ParamLayerNorm(nn.Module):
    """nn.LayerNorm-compatible module (same param names/shapes/init, same
    f32 fast-variance statistics) that can also hand out its raw
    scale/bias so the fused Pallas FFN sublayer (ops/pallas/ffn.py) can
    apply the normalization inside the kernel. Checkpoints are
    interchangeable with nn.LayerNorm."""

    epsilon: float = 1e-12
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_weights: bool = False):
        H = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (H,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (H,),
                          self.param_dtype)
        if return_weights:
            return scale, bias
        # flax nn.LayerNorm semantics: f32 reductions, fast variance
        # E[x^2]-E[x]^2 clipped at 0, scale folded into rsqrt.
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            - jnp.square(mu), 0.0)
        mul = jax.lax.rsqrt(var + np.float32(self.epsilon)) \
            * scale.astype(jnp.float32)
        y = (xf - mu) * mul + bias.astype(jnp.float32)
        return y.astype(self.dtype)


def _fused_ffn_engaged() -> bool:
    """Trace-time gate for the fused FFN sublayer: engaged on a real TPU
    with working Mosaic, or when tests force interpret mode."""
    from multimodal_rare_disease_tpu.ops.pallas import ffn as _ffn
    from multimodal_rare_disease_tpu.ops.pallas.capability import (
        on_tpu, pallas_available,
    )

    if getattr(_ffn, "FORCE_INTERPRET", False):
        return True
    return on_tpu() and pallas_available()


def _fused_attn_out_engaged() -> bool:
    """Trace-time gate for the fused attention-output sublayer."""
    from multimodal_rare_disease_tpu.ops.pallas import attn_out as _ao
    from multimodal_rare_disease_tpu.ops.pallas.capability import (
        on_tpu, pallas_available,
    )

    if getattr(_ao, "FORCE_INTERPRET", False):
        return True
    return on_tpu() and pallas_available()


def _gelu_exact_erf(x: jnp.ndarray) -> jnp.ndarray:
    """Exact GELU via lax.erf: x/2 * (1 + erf(x/sqrt(2))).

    Same math as HF BERT's "gelu" activation (torch.nn.functional.gelu
    default, ref `src/text_encoder.py` encoder stacks), but deliberately
    NOT jax.nn.gelu(approximate=False): that lowers through erfc, whose
    XLA expansion is a ~60-op f32 rational (with exp and divides) per
    element — measured 2.6 ms per FFN at B=256/T=128 on v5e because the
    whole expansion is recomputed as a matmul prologue (31 ms/step across
    12 layers; see artifacts/profile_trace.py). lax.erf's f32 expansion
    is a short polynomial.
    """
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jax.lax.erf(xf * np.float32(0.7071067811865476)))
    return y.astype(x.dtype)


class BertSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dropout: float
    quantized: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias, attention_mask=None,
                 train: bool = False, output_attentions: bool = False,
                 cls_query_only: bool = False,
                 query_positions=None,
                 return_unprojected: bool = False):
        """With `return_unprojected=True` the module creates the same
        output-projection params but returns `(ctx, wo, bo)` unapplied,
        so BertLayer can run the fused attn-out+residual+LN Pallas
        sublayer (ops/pallas/attn_out.py) on checkpoint-identical
        weights.

        `query_positions` [B, P] (with cls_query_only) generalizes the
        CLS-only fast path to sequence-packed batches: Q is computed
        for those positions only (one per packed document), K/V stay
        full-sequence. Numerically identical to slicing the full
        forward at the same positions."""
        from multimodal_rare_disease_tpu.models.quant import (
            MaybeQuantDenseGeneral,
        )

        # The residual stream arrives either as [B, T, H] (classic) or
        # flattened [B*T, H] (flat mode, see BertEncoder.flat_residual);
        # attention is the only sublayer that needs the [B, T, ...] view,
        # so it reshapes around its core and hands back the caller's rank.
        flat = hidden.ndim == 2
        if flat:
            B = attention_bias.shape[0]
            T = hidden.shape[0] // B
            H = hidden.shape[-1]
        else:
            B, T, H = hidden.shape
        d = self.hidden_size // self.num_heads
        q8 = self.quantized and not train
        # fused QKV: one [H, 3, h, d] matmul instead of three [H, h, d]
        # (better MXU utilization; HF q/k/v weights concat into this kernel
        # at conversion time, models/convert.py)
        qkv_mod = MaybeQuantDenseGeneral((3, self.num_heads, d), axis=-1,
                                         quantized=q8,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         kernel_init=_HF_INIT,
                                         name="qkv")
        hd = self.num_heads * d
        if cls_query_only and not q8:
            # final-layer fast path: only the CLS position is consumed
            # downstream, so compute Q for position 0 only and K/V for
            # the full sequence — skips (T-1)/T of the Q projection
            # (~0.2 ms/step at B=256/T=128). Same params via
            # return_weights ([H, 3*h*d] row-major = Q block first);
            # same dtype-dot semantics as the module's own path, so
            # numerically identical to slicing the fused output.
            w2d, b_all = qkv_mod(hidden, return_weights=True)
            h2 = hidden if flat else hidden.reshape(B * T, H)
            if query_positions is not None:
                h3 = h2.reshape(B, T, H)
                q_rows = jnp.take_along_axis(
                    h3, query_positions[:, :, None], axis=1)  # [B,P,H]
                P = q_rows.shape[1]
            else:
                q_rows = h2[::T] if flat else hidden[:, 0]
                P = 1
            dt = self.dtype
            q = (jnp.dot(q_rows.reshape(B * P, H).astype(dt),
                         w2d[:, :hd].astype(dt))
                 + b_all[:hd].astype(dt)).reshape(B, P, self.num_heads, d)
            kv = (jnp.dot(h2.astype(dt), w2d[:, hd:].astype(dt))
                  + b_all[hd:].astype(dt)).reshape(B, T, 2,
                                                   self.num_heads, d)
            k, v = kv[:, :, 0], kv[:, :, 1]
        else:
            qkv = qkv_mod(hidden)  # [B,T,3,h,d]
            if flat:
                qkv = qkv.reshape(B, T, 3, self.num_heads, d)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if cls_query_only:
                # quantized fallback: restrict the query to the consumed
                # positions (numerically identical to slicing the output)
                if query_positions is not None:
                    q = jnp.take_along_axis(
                        q, query_positions[:, :, None, None], axis=1)
                else:
                    q = q[:, :1]

        # Lane-pad the attention core when T doesn't fill the 128-lane
        # tile (the serving T=96 bucket): at T=96 XLA assigns the qkv
        # dot a batch-major layout and the q/k/v extractions become 36
        # materializing relayout copies at ~0.34 ms each — 13.7 ms/step
        # of the 58 ms total (artifacts/round3/profile_comp_t96_classic
        # .log). Padding K/V (and Q) up to the next 128 multiple runs
        # the einsums on aligned shapes; padded keys carry a -1e9
        # additive bias so exp(bias - max) underflows to exactly 0.0 in
        # f32 — the softmax denominator and the AV contraction are
        # bit-identical to the unpadded forward (padded V rows are
        # zero), and padded query rows are sliced off. Inference-only:
        # under train the probs-dropout RNG shape would change draws.
        pad_t = 0
        if (not train and not output_attentions and T % 128 != 0
                and T > 64 and attention_bias.shape[2] == 1):
            pad_t = 128 - T % 128
            k = jnp.pad(k, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
            if not cls_query_only:
                q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
            attention_bias = jnp.pad(attention_bias,
                                     ((0, 0), (0, 0), (0, 0), (0, pad_t)),
                                     constant_values=-1e9)
            if attention_mask is not None:
                attention_mask = jnp.pad(attention_mask,
                                         ((0, 0), (0, pad_t)))

        if cls_query_only and attention_bias.shape[2] > 1:
            # packed 2-D mask [B,1,T,T]: keep only the restricted
            # queries' bias rows -> [B,1,P,T]
            if query_positions is not None:
                attention_bias = jnp.take_along_axis(
                    attention_bias, query_positions[:, None, :, None],
                    axis=2)
            else:
                attention_bias = attention_bias[:, :, :1]

        # XLA's batched einsum + convert/max/exp/div softmax fusion IS the
        # fast path at every shape this workload has: a Pallas fused-MHA
        # kernel (`fused_attention`) was measured slower in round 2
        # (0.37 vs 0.98-1.49 ms/layer, artifacts/PERF_R2.md) and again in
        # round 3 (2.6x, artifacts/PERF_R3.md) and deleted per the
        # docs/PERF.md deletion policy (see its graveyard section).
        scores = jnp.einsum("bthd,bshd->bhts", q, k) \
            / jnp.sqrt(d).astype(self.dtype)
        scores = scores + attention_bias  # [B,1,1,T] additive mask
        probs = nn.softmax(scores.astype(jnp.float32),
                           axis=-1).astype(self.dtype)
        probs_dropped = nn.Dropout(rate=self.dropout)(
            probs, deterministic=not train)
        ctx = jnp.einsum("bhts,bshd->bthd", probs_dropped, v)
        if pad_t and not cls_query_only:
            ctx = ctx[:, :T]  # drop the padded query rows
        if flat:
            ctx = ctx.reshape(B * ctx.shape[1], self.num_heads, d)
        out_mod = MaybeQuantDenseGeneral(
            H, axis=(-2, -1), quantized=q8, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=_HF_INIT,
            name="output")
        if return_unprojected:
            wo, bo = out_mod(ctx, return_weights=True)
            return (ctx, wo, bo), probs
        out = out_mod(ctx)
        if output_attentions:
            return out, probs
        return out, None


class BertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout: float
    fused_ffn: bool = True
    fused_attn_out: bool = False
    quantized: bool = False
    pre_ln: bool = False
    ln_barrier: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attention_bias, attention_mask=None,
                 train: bool = False, output_attentions: bool = False,
                 cls_only: bool = False, query_positions=None):
        from multimodal_rare_disease_tpu.models.quant import (
            MaybeQuantDenseGeneral,
        )

        # pre_ln=True applies the same two LayerNorms BEFORE their
        # sublayers (GPT-2/ViT placement) instead of after the residual
        # (HF BERT). Post-LN is the conversion-parity default; pre-LN is
        # the from-scratch trainability option: at 12x3072 on tiny
        # corpora the post-LN stack sits at the uniform-logits attractor
        # (docs/TRAINING.md scale cliff) while pre-LN descends.
        ln_att = ParamLayerNorm(epsilon=1e-12, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="attention_ln")
        ln_out = ParamLayerNorm(epsilon=1e-12, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="output_ln")

        # Optional fusion barrier between each residual add and its
        # LayerNorm (identity on values and gradients). Hypothesis was
        # that XLA fusing the LN's f32 convert + mean/var reduces into
        # the preceding matmul epilogue caused the 1.58 ms
        # convert_reduce_fusions at B=256/T=96 (17.4 ms/step, see
        # artifacts/profile_trace3.py); measured OFF as default: the
        # barrier made BERT-only *slower* (40.98 vs 39.05 ms/step on
        # v5e) because the split forces an extra HBM materialization of
        # the residual per LN. Kept as a toggle for other stacks.
        def _fb(x):
            return jax.lax.optimization_barrier(x) if self.ln_barrier else x

        q8 = self.quantized and not train
        from multimodal_rare_disease_tpu.ops.pallas import attn_out as _ao
        from multimodal_rare_disease_tpu.ops.pallas.capability import on_tpu

        M_rows = int(np.prod(hidden.shape[:-1]))
        # Fused attn-out+residual+LN Pallas sublayer (inference): one
        # HBM pass instead of the dot-with-LN-stats-epilogue + separate
        # normalize pass (0.437 -> ~0.30 ms/layer at B=256/T=128 on
        # v5e — ops/pallas/attn_out.py header). Same param modules, so
        # checkpoints are interchangeable.
        use_fused_attnout = (
            self.fused_attn_out and not train and not q8 and not self.pre_ln
            and not self.ln_barrier and not cls_only
            and not output_attentions
            and _ao.attn_out_ln_fusible(M_rows, self.hidden_size)
            and _fused_attn_out_engaged())
        attn_in = ln_att(_fb(hidden)) if self.pre_ln else hidden
        attn_out, probs = BertSelfAttention(
            self.hidden_size, self.num_heads, self.dropout,
            quantized=self.quantized,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attention",
        )(attn_in, attention_bias, attention_mask=attention_mask, train=train,
          output_attentions=output_attentions, cls_query_only=cls_only,
          query_positions=query_positions,
          return_unprojected=use_fused_attnout)
        if cls_only:
            # the rest of the layer (residual, LNs, FFN) runs on the
            # consumed positions only — one per (packed) document
            # (numerics unchanged)
            if hidden.ndim == 2:  # flat [B*T, H] stream → [B, H]
                B = attention_bias.shape[0]
                hidden = hidden.reshape(B, -1, hidden.shape[-1])[:, 0]
            elif query_positions is not None:
                hidden = jnp.take_along_axis(
                    hidden, query_positions[:, :, None], axis=1)
            else:
                hidden = hidden[:, :1]
        from multimodal_rare_disease_tpu.ops.pallas import ffn as _ffn

        # The post-LN fused-FFN kernel can absorb the attention
        # LayerNorm as an in-kernel input LN (ops/pallas/ffn.py
        # _ffn_pre_ln_kernel) — decide the FFN dispatch BEFORE applying
        # ln_att so its separate HBM normalize pass (0.156 ms/layer at
        # B=256/T=128, profile_comp_t128.log) can be skipped entirely.
        M_ffn = int(np.prod(hidden.shape[:-1]))
        use_fused_ffn = (
            self.fused_ffn and not train and not q8 and not self.pre_ln
            and not self.ln_barrier
            and _ffn.ffn_ln_fusible(M_ffn, self.hidden_size,
                                    self.intermediate_size)
            and _fused_ffn_engaged())

        ln0_weights = None
        if use_fused_attnout:
            ctx, wo, bo = attn_out
            gamma, beta = ln_att(hidden, return_weights=True)
            h2 = _ao.fused_attn_out_ln(
                ctx.reshape(M_rows, self.hidden_size),
                hidden.reshape(M_rows, self.hidden_size),
                wo, bo, gamma, beta, eps=1e-12, interpret=not on_tpu())
            hidden = h2.reshape(hidden.shape)
            ffn_in = hidden
        else:
            attn_out = nn.Dropout(rate=self.dropout)(
                attn_out, deterministic=not train)
            if self.pre_ln:
                hidden = hidden + attn_out
                ffn_in = ln_out(_fb(hidden))
            elif use_fused_ffn:
                # hand the UNNORMALIZED residual to the kernel; ln_att's
                # params are created identically (return_weights)
                ffn_in = hidden + attn_out
                ln0_weights = ln_att(ffn_in, return_weights=True)
            else:
                hidden = ln_att(_fb(hidden + attn_out))
                ffn_in = hidden

        inter_mod = MaybeQuantDenseGeneral(
            self.intermediate_size, quantized=q8, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=_HF_INIT,
            name="intermediate")
        out_mod = MaybeQuantDenseGeneral(
            self.hidden_size, quantized=q8, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=_HF_INIT,
            name="output")

        M = int(np.prod(ffn_in.shape[:-1]))
        if use_fused_ffn:
            # Whole post-LN FFN sublayer in one Pallas kernel — the
            # [M, intermediate] tensor never leaves VMEM and the
            # residual+LN HBM pass disappears (~5 ms/step across the 12
            # layers at B=256/T=128 on v5e — ops/pallas/ffn.py header).
            # Params come from the SAME modules as the classic path
            # (return_weights), so checkpoints are interchangeable and
            # the tree is identical; dropout is deterministic-identity
            # here (inference only).
            w1, b1 = inter_mod(ffn_in, return_weights=True)
            w2, b2 = out_mod(
                jnp.zeros((1, self.intermediate_size), self.dtype),
                return_weights=True)
            gamma, beta = ln_out(ffn_in, return_weights=True)
            pre_g, pre_b = ln0_weights if ln0_weights is not None \
                else (None, None)
            y2 = _ffn.fused_ffn_ln(
                ffn_in.reshape(M, self.hidden_size), w1, b1, w2, b2,
                gamma, beta, eps=1e-12, interpret=not on_tpu(),
                pre_gamma=pre_g, pre_beta=pre_b)
            hidden = y2.reshape(ffn_in.shape)
            return hidden, probs

        inter = _gelu_exact_erf(inter_mod(ffn_in))
        out = out_mod(inter)
        out = nn.Dropout(rate=self.dropout)(out, deterministic=not train)
        if self.pre_ln:
            hidden = hidden + out
        else:
            hidden = ln_out(_fb(hidden + out))
        return hidden, probs


class BertEncoder(nn.Module):
    """BERT-base encoder returning a dict of outputs."""

    vocab_size: int = 28996
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    fused_ffn: bool = True
    fused_attn_out: bool = False
    quantized: bool = False
    pre_ln: bool = False
    ln_barrier: bool = False
    flat_residual: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,        # [B, T] int32
        attention_mask: jnp.ndarray,   # [B, T] {0,1}
        token_type_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
        cls_only_final: bool = False,
        position_ids: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        query_positions: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """When `cls_only_final` (inference fast path), the LAST layer
        computes only the CLS position (its query attends over the full
        sequence — numerically identical to slicing the full forward at
        position 0) and `last_hidden_state` comes out as [B, 1, H].
        Ignored when full hidden states / attentions are requested.

        Sequence-packed batches (inference/packing.py): several short
        documents share one row. `segment_ids` [B, T] (0 = pad, 1..k =
        document) builds a block-diagonal attention mask, so cross-
        document scores carry a -1e9 bias whose softmax contribution
        underflows to exactly 0 — per-document outputs are bit-identical
        to the unpacked forward. `position_ids` [B, T] restarts positions
        at each document start; `query_positions` [B, P] are the CLS
        positions (one per document) the final layer computes, and
        `cls`/`pooler_output` come out as [B, P, H]."""
        B, T = input_ids.shape
        cls_only_final = (cls_only_final and not output_hidden_states
                          and not output_attentions)
        packed = segment_ids is not None
        if position_ids is not None:
            positions = position_ids
        else:
            positions = jnp.arange(T)[None, :]

        word = nn.Embed(self.vocab_size, self.hidden_size,
                        param_dtype=self.param_dtype, dtype=self.dtype,
                        embedding_init=_HF_INIT, name="word_embeddings")(input_ids)
        pos = nn.Embed(self.max_position_embeddings, self.hidden_size,
                       param_dtype=self.param_dtype, dtype=self.dtype,
                       embedding_init=_HF_INIT, name="position_embeddings")(positions)
        seg_mod = nn.Embed(self.type_vocab_size, self.hidden_size,
                           param_dtype=self.param_dtype, dtype=self.dtype,
                           embedding_init=_HF_INIT,
                           name="token_type_embeddings")
        if token_type_ids is None:
            # single-segment fast path: every position embeds row 0, so
            # look up one row and broadcast instead of a [B*T]-row gather
            # (the gather of a constant-0 index tensor measured 0.166
            # ms/step at B=256/T=128 on v5e — profile_comp_t128.log)
            seg = seg_mod(jnp.zeros((1, 1), jnp.int32))
        else:
            seg = seg_mod(token_type_ids)
        hidden = word + pos + seg
        hidden = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="embeddings_ln")(hidden)
        hidden = nn.Dropout(rate=self.dropout)(hidden, deterministic=not train)

        # additive attention bias: 0 for real tokens, large negative for pad
        if packed:
            # block-diagonal: key allowed iff same nonzero document id
            same = segment_ids[:, :, None] == segment_ids[:, None, :]
            allowed = same & (segment_ids[:, None, :] != 0)
            bias = jnp.where(allowed, 0.0, -1e9)[:, None]  # [B,1,T,T]
        else:
            bias = (1.0 - attention_mask[:, None, None, :]
                    .astype(jnp.float32)) * -1e9
        bias = bias.astype(self.dtype)

        # Flat-2D residual stream: keep hidden as [B*T, H] between layers
        # so every FFN/projection dot is an unambiguous [B*T, K] x [K, N]
        # matmul. At T=128 this is neutral; at T=96 (the serving bucket)
        # a [B, T, H] stream makes XLA's layout assignment disagree with
        # itself — {2,0,1} on part of the stream, 4.85 ms of relayout
        # copies, and the FFN output projections lowered as convolutions
        # at 37% MFU (artifacts/profile_trace3.py, dump_hlo.py). The
        # values are identical (pure reshapes); attention reshapes to
        # [B, T, ...] around its core. Viz paths (hidden states /
        # attentions) keep the classic 3D stream.
        flat = (self.flat_residual and not output_hidden_states
                and not output_attentions and not packed)
        if flat:
            hidden = hidden.reshape(B * T, self.hidden_size)

        all_hidden = [hidden] if output_hidden_states else None
        all_attn = [] if output_attentions else None
        for i in range(self.num_layers):
            hidden, probs = BertLayer(
                self.hidden_size, self.num_heads, self.intermediate_size,
                self.dropout,
                fused_ffn=self.fused_ffn,
                fused_attn_out=self.fused_attn_out,
                quantized=self.quantized, pre_ln=self.pre_ln,
                ln_barrier=self.ln_barrier,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer{i}",
            )(hidden, bias,
              attention_mask=None if packed else attention_mask,
              train=train,
              output_attentions=output_attentions,
              cls_only=cls_only_final and i == self.num_layers - 1,
              query_positions=query_positions if packed else None)
            if output_hidden_states:
                all_hidden.append(hidden)
            if output_attentions:
                all_attn.append(probs)

        if self.pre_ln:
            # pre-LN stacks need one final normalization before readout
            hidden = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="final_ln")(hidden)
        if flat:
            # back to [B, T', H] for the public contract (T'=1 after the
            # cls-only final layer, where the stream is already [B, H])
            hidden = hidden.reshape(B, -1, self.hidden_size)
        if packed and query_positions is not None:
            if cls_only_final:
                cls = hidden  # already the P query positions: [B, P, H]
            else:
                cls = jnp.take_along_axis(
                    hidden, query_positions[:, :, None], axis=1)
        else:
            cls = hidden[:, 0, :]
        pooled = nn.Dense(self.hidden_size, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          kernel_init=_HF_INIT, name="pooler")(cls)
        pooled = jnp.tanh(pooled)

        out: Dict[str, Any] = {
            "last_hidden_state": hidden,
            "cls": cls,
            "pooler_output": pooled,
        }
        if output_hidden_states:
            out["hidden_states"] = tuple(all_hidden)
        if output_attentions:
            out["attentions"] = tuple(all_attn)
        return out


class TextEncoder(nn.Module):
    """Text encoder wrapper: BERT → [B, 768] embedding (+ optional projection).

    Parity with the reference's `TextEncoder` / `TextEncoderWithProjection`
    (`src/text_encoder.py:27-269`): embedding = CLS token by default, or
    the tanh pooler when use_pooler_output; dropout on top; optional
    projection head to `projection_dim`.
    """

    vocab_size: int = 28996
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    bert_dropout: float = 0.1
    dropout: float = 0.1
    use_pooler_output: bool = False
    projection_dim: int = 0  # 0 = no projection (raw 768-d)
    fused_ffn: bool = True
    fused_attn_out: bool = False
    quantized: bool = False
    pre_ln: bool = False
    ln_barrier: bool = False
    flat_residual: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.bert = BertEncoder(
            vocab_size=self.vocab_size,
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            max_position_embeddings=self.max_position_embeddings,
            type_vocab_size=self.type_vocab_size,
            dropout=self.bert_dropout,
            fused_ffn=self.fused_ffn,
            fused_attn_out=self.fused_attn_out,
            quantized=self.quantized,
            pre_ln=self.pre_ln,
            ln_barrier=self.ln_barrier,
            flat_residual=self.flat_residual,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bert",
        )
        self.drop = nn.Dropout(rate=self.dropout)
        if self.projection_dim:
            self.proj = nn.Dense(self.projection_dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype, name="projection")

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        token_type_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
        position_ids: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        query_positions: Optional[jnp.ndarray] = None,
    ):
        out = self.bert(
            input_ids,
            attention_mask,
            token_type_ids=token_type_ids,
            train=train,
            output_hidden_states=output_hidden_states,
            output_attentions=output_attentions,
            # the embedding consumed here is always position 0 (CLS or
            # pooler), so inference can skip the last layer's other T-1
            # positions entirely; full forward when states are requested
            cls_only_final=not train,
            position_ids=position_ids,
            segment_ids=segment_ids,
            query_positions=query_positions,
        )
        emb = out["pooler_output"] if self.use_pooler_output else out["cls"]
        emb = self.drop(emb, deterministic=not train)
        if self.projection_dim:
            emb = self.proj(emb)
            emb = nn.relu(emb)
        if output_hidden_states or output_attentions:
            return emb, out
        return emb


def create_text_encoder(
    cfg: TextEncoderConfig,
    dtype: Dtype = jnp.float32,
    param_dtype: Dtype = jnp.float32,
    projection_dim: int = 0,
    name: str = None,
) -> TextEncoder:
    """Factory, parity with `create_text_encoder` (`src/text_encoder.py:272`)."""
    return TextEncoder(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        bert_dropout=cfg.dropout,
        dropout=cfg.dropout,
        use_pooler_output=cfg.use_pooler_output,
        projection_dim=projection_dim,
        fused_ffn=getattr(cfg, "fused_ffn", True),
        fused_attn_out=getattr(cfg, "fused_attn_out", False),
        quantized=cfg.quantized_inference,
        pre_ln=getattr(cfg, "pre_layernorm", False),
        flat_residual=getattr(cfg, "flat_residual", False),
        dtype=dtype,
        param_dtype=param_dtype,
        name=name,
    )

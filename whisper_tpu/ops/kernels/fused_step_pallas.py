"""Whole-step fused decoder kernel: all L layers of one decode step in ONE
``pallas_call``.

Why (docs/FUSED_STEP_DESIGN.md, measured round 2): at batch 1 the decode
step is HBM-bandwidth-bound and XLA's per-layer fusions reach only ~55-80%
of peak with ~9 us/layer of scan-iteration gaps — no single op is worth a
kernel; only removing the op boundaries is.  Single-op kernels (fc2
epilogue, per-layer fused MLP) measurably LOSE to XLA because XLA pipelines
the next layer's weight prefetch across the scan boundary
(ops/kernels/mlp_pallas.py STATUS).  This kernel internalizes that
pipeline: the grid is ``(layer, phase)`` and Pallas double-buffers every
phase's HBM->VMEM block copy across all grid steps *including across
layers*, while the residual stream and all activations stay resident in
VMEM scratch for the whole 32-layer pass.

Replaces (per step) the reference's per-layer module calls
(``/root/reference/whisper/model.py:123-146``, hook KV cache 310-341) and
this repo's XLA layer scan (models/whisper.decoder_step) for single-audio
decodes: B=1 greedy, and B=n_group rows for beam search / best-of sampling
of ONE audio (all rows share that audio's cross-KV stream, so the dominant
weight + cross-KV HBM traffic amortizes over the group — the reference
CLI's default config is beam_size=5 on a single file).  The XLA engine
remains the fallback for multi-audio batches, CPU, and meshes.

Phase layout per layer (NTA = cross-attention time chunks):

====  ======================  =======================================
c     weight tile resident    computation
====  ======================  =======================================
0     q_w                     ln1; q
1     k_w                     k_new (-> output + scratch)
2     v_w                     v_new; full self-attention
3     o_w                     o proj + residual; ln2
4     xq_w                    xq; init streaming-softmax state
5..   (xq_w held)             cross-attn chunk j (online softmax)
5+NTA xo_w                    xo proj + residual; ln3
+1..4 fc1_w col block i       fc1 slice + GELU
+5..8 fc2_w row block i       fc2 partial accumulation; last: residual
====  ======================  =======================================

Weights are packed once per model into ``(L, 14, C, C)`` tiles (int8 with
per-output-channel scales, or the compute dtype) by
:func:`pack_fused_weights`; biases and LayerNorm parameters ride one
``(L, 16C)`` float32 block per layer.  Cross K/V stream in time chunks
with flash-style online softmax; self K/V load one ``(H, D, T)`` block per
layer.  The KV-cache column write stays OUTSIDE the kernel (it is ~20 us
in XLA and writing it here would force a full cache copy through VMEM).
"""

import os
import warnings
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float(np.finfo(np.float32).min)

_TA_CHUNK = 512  # cross-attention time-chunk width (lane-aligned)

# Per-kernel scoped-VMEM ceiling.  v5e VMEM is 128 MiB; Mosaic needs its own
# stack headroom on top of the block/scratch demand, so the kernel never
# requests more than this — block shapes (SG/CG/ta_chunk) shrink instead.
_VMEM_CEIL = int(os.environ.get("WHISPER_TPU_FUSED_VMEM_CEIL_MB", "100")) * 2**20
# Slack on top of the tile-padded block demand: Mosaic internals (semaphores,
# copy descriptors, spills).  BENCH_r04 proved 8 MB over a *raw* byte estimate
# is not enough (the padded demand came in 1.65 MB over); measured on the
# failing config, the compiler's true scoped demand sits ~5 MB above the
# padded block sum, so 12 MB leaves ~7 MB of toolchain-drift headroom while
# staying far below the 128 MB physical VMEM.
_VMEM_SLACK = 12 * 2**20


def _group_env(var: str, n: int, default_cap: int) -> int:
    """Rows/audios per phase: the env override if it is a positive divisor of
    n, else the largest divisor of n that is <= default_cap.  A set-but-unused
    override warns instead of being silently discarded."""
    env = int(os.environ.get(var, "0"))
    if env > 0 and n % env == 0:
        return env
    if env:
        warnings.warn(
            f"{var}={env} ignored: must be a positive divisor of {n}",
            stacklevel=2,
        )
    g = 1
    for d in range(1, min(n, default_cap) + 1):
        if n % d == 0:
            g = d
    return g


def _block_bytes(shape, dtype) -> int:
    """VMEM bytes of one block, padded to Mosaic's tile layout.

    Mosaic lays the last two dims out in (sublane, 128) tiles where the
    sublane multiple is 8 for 4-byte, 16 for 2-byte and 32 for 1-byte
    element types (the ``T(8,128)(2,1)`` layouts in compiler dumps); leading
    dims are untiled.  Summing raw ``prod(shape) * itemsize`` undercounts
    narrow-minor blocks — e.g. an (H, D, B) f32 buffer at B=16 really
    occupies H*D*128 lanes — which is exactly how the round-4 hand-summed
    budget came in 1.65 MB short of the compiler's scoped demand
    (BENCH_r04.json).
    """
    itemsize = np.dtype(dtype).itemsize
    sub = {4: 8, 2: 16, 1: 32}[itemsize]
    dims = [int(d) for d in shape]
    if len(dims) == 1:
        dims = [1] + dims
    dims[-1] = -(-dims[-1] // 128) * 128
    dims[-2] = -(-dims[-2] // sub) * sub
    n = 1
    for d in dims:
        n *= d
    return n * itemsize


def _next_smaller_divisor(g: int, n: int) -> Optional[int]:
    for d in range(g - 1, 0, -1):
        if n % d == 0:
            return d
    return None


def _next_smaller_chunk(tc: int, ta_pad: int) -> Optional[int]:
    """Largest lane-aligned (multiple-of-128) divisor of ta_pad below tc."""
    for cand in range(tc - 128, 127, -128):
        if ta_pad % cand == 0:
            return cand
    return None


def _shrink_blocks(demand, B: int, A: int, ta_pad: int,
                   sg: int, cg: int, tc: int, ceil: int) -> Tuple[int, int, int]:
    """Shrink the multi-audio block set until ``demand(sg, cg, tc) <= ceil``.

    Order: big cross chunks first (they dominate VMEM and NTA>1 is measured
    free), then self groups, then cross groups, then chunks below the
    _TA_CHUNK baseline as a last resort.  Terminates at the minimal set
    (sg=1, cg=1, tc=128) even if demand still exceeds the ceiling — the
    compiler gets the final verdict there (and the engine-level fallback
    catches it if it refuses).
    """
    while demand(sg, cg, tc) > ceil:
        if tc > _TA_CHUNK and (nc := _next_smaller_chunk(tc, ta_pad)):
            tc = nc
            continue
        if sg > 1:
            sg = _next_smaller_divisor(sg, B)
            continue
        if cg > 1:
            cg = _next_smaller_divisor(cg, A)
            continue
        if nc := _next_smaller_chunk(tc, ta_pad):
            tc = nc
            continue
        break  # minimal block set; leave the verdict to the compiler
    return sg, cg, tc

# weight tile order in the packed (L, 14, C, C) buffer
_T_Q, _T_K, _T_V, _T_O, _T_XQ, _T_XO = 0, 1, 2, 3, 4, 5
_T_FC1 = 6  # 6..9: fc1 column blocks
_T_FC2 = 10  # 10..13: fc2 row blocks
_N_TILES = 14


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


class FusedPack(NamedTuple):
    """Per-model packed decoder weights for the fused step kernel."""

    w: jax.Array  # (L, 14, C, C) int8 or compute dtype
    ws: jax.Array  # (L, 14, 1, C) f32 per-output-channel scales (ones if unquantized)
    consts: jax.Array  # (L, 1, 16*C) f32 biases + LN params


def _tile_of(leaf, dtype):
    """(tile, scale) for one weight leaf; scale is per output channel.

    Stacked quantized leaves are {"q": (L, in, out), "s": (L, 1, out)}.
    """
    if isinstance(leaf, dict):
        return leaf["q"], leaf["s"][..., 0, :].astype(jnp.float32)
    w = leaf.astype(dtype)
    return w, jnp.ones((w.shape[-1],), jnp.float32)


def pack_fused_weights(params: Dict[str, Any], dims) -> FusedPack:
    """Pack stacked decoder block weights into kernel layout.

    Run OUTSIDE any jit that executes per decode call — the pack is a
    one-time per-model device copy (~0.8 GB for large-v3 int8) cached by
    the caller.
    """
    blocks = params["decoder"]["blocks"]
    C = dims.n_text_state
    L = dims.n_text_layer
    dtype = params["decoder"]["tok_emb"].dtype

    q_w, q_s = _tile_of(blocks["q_w"], dtype)  # (L, C, C)
    k_w, k_s = _tile_of(blocks["k_w"], dtype)
    v_w, v_s = _tile_of(blocks["v_w"], dtype)
    o_w, o_s = _tile_of(blocks["o_w"], dtype)
    xq_w, xq_s = _tile_of(blocks["xq_w"], dtype)
    xo_w, xo_s = _tile_of(blocks["xo_w"], dtype)
    fc1_w, fc1_s = _tile_of(blocks["fc1_w"], dtype)  # (L, C, 4C), (4C,)
    fc2_w, fc2_s = _tile_of(blocks["fc2_w"], dtype)  # (L, 4C, C), (C,)

    def bcast(s, n):  # scale to (L, n) whether per-layer or shared
        s = jnp.asarray(s)
        if s.ndim == 1:
            return jnp.broadcast_to(s[None], (L, n))
        return s.reshape(L, n)

    wdtype = q_w.dtype
    tiles = [q_w, k_w, v_w, o_w, xq_w, xo_w]
    scales = [bcast(s, C) for s in (q_s, k_s, v_s, o_s, xq_s, xo_s)]
    for i in range(4):  # fc1 column blocks
        tiles.append(fc1_w[:, :, i * C : (i + 1) * C])
        scales.append(bcast(fc1_s, 4 * C)[:, i * C : (i + 1) * C])
    for i in range(4):  # fc2 row blocks (shared output scale, applied once)
        tiles.append(fc2_w[:, i * C : (i + 1) * C, :])
        scales.append(bcast(fc2_s, C))
    w = jnp.stack([t.astype(wdtype) for t in tiles], axis=1)  # (L, 14, C, C)
    # singleton axes keep Mosaic's block-shape rule happy (the trailing two
    # block dims must be full or (8, 128)-divisible)
    ws = jnp.stack(scales, axis=1)[:, :, None, :]  # (L, 14, 1, C)

    f32 = lambda k: blocks[k].astype(jnp.float32).reshape(L, -1)
    consts = jnp.concatenate(
        [
            f32("q_b"), f32("v_b"), f32("o_b"), f32("xq_b"), f32("xo_b"),
            f32("fc2_b"),
            f32("attn_ln_g"), f32("attn_ln_b"),
            f32("xattn_ln_g"), f32("xattn_ln_b"),
            f32("mlp_ln_g"), f32("mlp_ln_b"),
            f32("fc1_b"),
        ],
        axis=1,
    )[:, None, :]  # (L, 1, 16C)
    return FusedPack(w=w, ws=ws, consts=consts)


def pad_cross_kv(xk, xv) -> Tuple[jax.Array, jax.Array, Optional[jax.Array], Optional[jax.Array]]:
    """Pad cross K/V (possibly int8 dicts) to a TA_CHUNK multiple.

    Input: (L, A, H, D, Ta) arrays or ``quantize_kv`` dicts.  Returns
    (k, v, k_scale, v_scale) with time padded to ceil(Ta/512)*512; scales
    are (L, H, D, A) f32 (the kernel's per-head column layout, one scale
    column per audio) or None when unquantized.
    """

    def split(x):
        if isinstance(x, dict):
            # (L, A, H, D, 1) -> (L, H, D, A): the kernel consumes scales as
            # (H, D, A) per-head columns matching its (H, D, B) query layout
            return x["q"], jnp.transpose(
                x["s"].astype(jnp.float32)[..., 0], (0, 2, 3, 1)
            )
        return x, None

    xkq, xks = split(xk)
    xvq, xvs = split(xv)
    ta = xkq.shape[-1]
    ta_pad = -(-ta // _TA_CHUNK) * _TA_CHUNK
    pad = [(0, 0)] * (xkq.ndim - 1) + [(0, ta_pad - ta)]
    return jnp.pad(xkq, pad), jnp.pad(xvq, pad), xks, xvs


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (Pallas has no erf lowering).

    Max abs error ~1.5e-7 — below bf16 resolution of the GELU output.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(x):
    return x * 0.5 * (1.0 + _erf(x * (2.0**-0.5)))


@partial(
    jax.jit,
    static_argnames=("dims", "interpret"),
)
def fused_decoder_layers(
    pack: FusedPack,
    dims,
    x: jax.Array,  # (B, C) compute dtype — token+position embeddings
    t: jax.Array,  # (B,) i32, uniform — cache positions < t are attended
    self_k: jax.Array,  # (L, B, H, D, T) — per-row caches
    self_v: jax.Array,
    xk: jax.Array,  # (L, A, H, D, Ta_pad) int8 or compute dtype
    xv: jax.Array,
    xk_s: Optional[jax.Array],  # (L, H, D, A) f32 or None
    xv_s: Optional[jax.Array],
    pend_k: Optional[jax.Array] = None,  # (L, B, H, D, W) — deferred KV block
    pend_v: Optional[jax.Array] = None,
    pend_w: Optional[jax.Array] = None,  # scalar i32 — valid pending columns
    *,
    interpret: Optional[bool] = None,  # None = auto (interpreter off-TPU)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """All decoder layers of one decode step (no embedding, no final LN).

    Returns (hidden (B, C) compute dtype, k_new (L, B, C), v_new (L, B, C)).
    Numerical contract: same op/dtype sequence as models.whisper.decoder_step
    (bf16 residual stream, f32 LN stats / attention softmax / matmul
    accumulation), so outputs agree to bf16 rounding; accumulation order
    inside attention differs (streaming softmax over cross-KV chunks).

    Row/audio shapes: B rows, A = xk.shape[1] audios.  A == 1 serves B = 1
    greedy and B = n_group beam/best-of rows sharing one audio (uniform
    position t); A == B serves multi-audio greedy batches (one row per
    audio, per-row positions t — the transcribe_batch/bench b16 shape):
    self-attention runs as B/SG grouped phases streaming (1, SG, H, D, T)
    cache blocks, and cross-attention as (A/CG)*NTA phases streaming
    (1, CG, H, D, ta_chunk) chunks whose online-softmax updates are masked
    to the owning rows.  SG/CG trade phase count (the dominant fixed cost,
    ~3 us/phase) against VMEM; override with WHISPER_TPU_FUSED_SG/_CG/_TC.

    With ``pend_k/pend_v/pend_w`` the step attends [cache (< t) | pending
    block (columns < pend_w) | new token] — the kernel half of the engine's
    deferred write-block scheme (models.whisper.decoder_step_pending): the
    caller stashes each step's K/V in the small pending block and flushes
    it into the cache every W steps, avoiding the full-cache rewrite.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = dims.n_text_layer
    C = dims.n_text_state
    H = dims.n_text_head
    D = C // H
    B = x.shape[0]
    A = xk.shape[1]  # audios carrying cross-KV (beams/samples share one)
    T = self_k.shape[-1]
    Ta_pad = xk.shape[-1]
    Ta = dims.n_audio_ctx
    multi = A > 1  # one row per audio (greedy multi-audio batch)
    assert A == 1 or A == B, (
        "fused step kernel: rows either all share one audio's cross-KV "
        "(A=1) or map one-to-one onto audios (A=B)"
    )
    assert self_k.shape[1] == B
    x_int8 = xk.dtype == jnp.int8
    cdtype = x.dtype
    has_pending = pend_k is not None
    assert not (has_pending and B > 1 and not multi), (
        "pending KV blocks: B=1 or per-row multi-audio only"
    )
    W = pend_k.shape[-1] if has_pending else 0

    def vmem_demand(sg, cg, tc):
        """Tile-padded scoped-VMEM bytes the kernel will ask Mosaic for:
        2x every double-buffered input/output block + scratch + slack."""
        sg_rows = sg if multi else B
        buffered = [
            ((B, C), cdtype),  # x
            ((1, 1, C, C), pack.w.dtype),  # weight tile
            ((1, 1, 1, C), jnp.float32),  # weight scales
            ((1, 1, 16 * C), jnp.float32),  # consts
            ((1, sg_rows, H, D, T), self_k.dtype),  # self k block
            ((1, sg_rows, H, D, T), self_v.dtype),
            ((1, cg, H, D, tc), xk.dtype),  # cross k chunk
            ((1, cg, H, D, tc), xv.dtype),
            ((1, H, D, A), jnp.float32),  # xk_s
            ((1, H, D, A), jnp.float32),
            ((B, C), cdtype),  # out
            ((1, B, C), cdtype),  # k_new
            ((1, B, C), cdtype),  # v_new
        ]
        if has_pending:
            buffered += [((1, sg_rows, H, D, max(W, 1)), cdtype)] * 2
        scratch = [
            ((B, C), cdtype), ((B, C), cdtype), ((B, C), cdtype),  # xres/hbuf/qbuf
            ((2, B, C), cdtype),  # kvbuf
            ((B, 4 * C), cdtype),  # fbuf
            ((B, C), jnp.float32),  # facc
            ((H, B, 128), jnp.float32), ((H, B, 128), jnp.float32),  # mrow/lrow
            ((H, D, B), jnp.float32), ((H, D, B), cdtype),  # xacc/qcol
        ]
        return (
            sum(2 * _block_bytes(s, d) for s, d in buffered)
            + sum(_block_bytes(s, d) for s, d in scratch)
            + _VMEM_SLACK
        )

    # cross-attention chunk width: the single-row bf16-weights + pending
    # config would exceed the default VMEM budget at 512 (weight tiles
    # 6.6 MB double-buffered + pending blocks); int8 weights leave headroom,
    # and the multi-audio variant raises vmem_limit_bytes instead (its
    # per-row/per-audio blocks stay small)
    # Multi-audio phase grouping: the multi kernel's gap to the byte floor
    # is per-phase fixed cost (~3 us/phase — measured round 4: owner-only
    # vs all-rows compute is identical, NTA=1 vs NTA=3 is identical), so
    # fewer, bigger phases win as long as the blocks fit VMEM.  SG rows
    # share one self-attention phase (block (1, SG, H, D, T)) and CG
    # audios share one full-width cross phase (block (1, CG, H, D, 1536)).
    if multi:
        SG = _group_env("WHISPER_TPU_FUSED_SG", B, 8)
        CG = _group_env("WHISPER_TPU_FUSED_CG", A, 2)
        tc_env = int(os.environ.get("WHISPER_TPU_FUSED_TC", "0"))
        ta_chunk = tc_env or Ta_pad
        if ta_chunk <= 0 or Ta_pad % ta_chunk:
            if tc_env:
                warnings.warn(
                    f"WHISPER_TPU_FUSED_TC={tc_env} ignored: must be a "
                    f"positive divisor of Ta_pad={Ta_pad}",
                    stacklevel=2,
                )
            ta_chunk = Ta_pad
        SG, CG, ta_chunk = _shrink_blocks(
            vmem_demand, B, A, Ta_pad, SG, CG, ta_chunk, _VMEM_CEIL
        )
    elif has_pending and pack.w.dtype != jnp.int8 and not x_int8:
        SG = CG = 1
        ta_chunk = 256
    else:
        SG = CG = 1
        ta_chunk = _TA_CHUNK
    NTA = Ta_pad // ta_chunk
    n_cross = (A // CG) * NTA
    # phase layout: q, k, v, [self-attention phases], o, xq, n_cross cross
    # chunks, xo, 4 fc1, 4 fc2.  Self-attention: at B=1 it runs inside the
    # v phase (the proven single-stream layout); at A=1, B>1 (beam group)
    # one all-rows phase loads the whole (B, H, D, T) block; at A=B each
    # group of SG rows gets one phase streaming an (1, SG, H, D, T) block.
    n_self = B // SG
    off = n_self if multi else (0 if B == 1 else 1)
    NC = 14 + n_cross + off

    if xk_s is None:
        xk_s = jnp.ones((L, H, D, A), jnp.float32)
        xv_s = jnp.ones((L, H, D, A), jnp.float32)

    c_o = 3 + off
    c_xq = 4 + off
    c_xo = 5 + off + n_cross
    c_fc1 = 6 + off + n_cross
    c_fc2 = 10 + off + n_cross

    def w_tile_index(l, c):
        # q/k/v -> tiles 0..2 | self phases + o hold tile 3 | xq + cross
        # chunks hold 4 | xo -> 5 | fc1 block i -> 6+i | fc2 block i -> 10+i
        tile = jnp.where(
            c <= 2,
            c,
            jnp.where(
                c <= c_o,
                3,
                jnp.where(c < c_xo, 4, jnp.where(c == c_xo, 5, c - (n_cross + off))),
            ),
        )
        return (l, tile, 0, 0)

    def cross_chunk_index(l, c):
        r = jnp.clip(c - c_xq - 1, 0, n_cross - 1)
        return (l, r // NTA, 0, 0, r % NTA)

    def self_row_index(l, c):
        # grouped self-attention phases (multi-audio): phase 3+g loads rows
        # [g*SG, (g+1)*SG)'s cache block (block index in SG-row units);
        # clipped constant elsewhere so no spurious refetch
        return (l, jnp.clip(c - 3, 0, n_self - 1), 0, 0, 0)

    def _kernel_body(
        t_ref,  # SMEM (1+B,): [valid pending cols, per-row cache boundaries]
        x_ref,  # (B, C) cdtype
        w_ref,  # (1, 1, C, C)
        ws_ref,  # (1, 1, 1, C) f32
        consts_ref,  # (1, 1, 16C) f32
        sk_ref,  # (1, B, H, D, T), or (1, 1, H, D, T) per-row when multi
        sv_ref,
        xk_ref,  # (1, 1, H, D, TA_CHUNK)
        xv_ref,
        xks_ref,  # (1, H, D, A) f32
        xvs_ref,
        maybe_pend,  # (pk_ref, pv_ref) (1, B or 1, H, D, W) tuple, or ()
        # outputs
        out_ref,  # (B, C) cdtype
        knew_ref,  # (1, B, C) cdtype
        vnew_ref,
        # scratch
        xres,  # (B, C) cdtype — residual stream
        hbuf,  # (B, C) cdtype — post-LN hidden
        qbuf,  # (B, C) cdtype — q / xq
        kvbuf,  # (2, B, C) cdtype — this layer's k_new/v_new
        fbuf,  # (B, 4C) cdtype — MLP hidden
        facc,  # (B, C) f32 — fc2 accumulation
        mrow,  # (H, B, 128) f32 — streaming softmax max (col 0 used)
        lrow,  # (H, B, 128) f32 — streaming softmax denom
        xacc,  # (H, D, B) f32 — streaming softmax numerator
        qcol,  # (H, D, B) cdtype — per-head query columns (self, then cross)
    ):
        l = pl.program_id(0)
        c = pl.program_id(1)
        w_now = t_ref[0]
        t_now = t_ref[1]  # uniform-position boundary (A == 1 paths)

        def ln(x32, off):
            g = consts_ref[0, 0, off : off + C]
            b = consts_ref[0, 0, off + C : off + 2 * C]
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
            return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)) * g[None] + b[None]

        def proj(h, bias_off=None):
            """h (B, C) @ resident tile, scaled, cast, plus optional bias."""
            wt = w_ref[0, 0]
            if wt.dtype == jnp.int8:
                wt = wt.astype(jnp.float32)
            y = jnp.dot(
                h, wt.astype(cdtype), preferred_element_type=jnp.float32
            )
            y = y * ws_ref[0, 0, 0][None]
            y = y.astype(cdtype)
            if bias_off is not None:
                y = y + consts_ref[0, 0, bias_off : bias_off + C][None].astype(cdtype)
            return y

        def to_col3(rows):
            """(B', C) rows -> (H, D, B') per-head columns (Mosaic supports
            the transpose and the lane-preserving sublane split; a direct
            (1, C) -> (H, D) reshape does not lower)."""
            b_ = rows.shape[0]
            return rows.reshape(b_, C).T.reshape(H, D, b_)

        def to_row(col3):
            """(H, D, B') -> (B', C) rows."""
            return col3.reshape(C, col3.shape[-1]).T

        @pl.when((l == 0) & (c == 0))
        def _init():
            xres[:] = x_ref[:]

        @pl.when(c == 0)  # ln1 + q
        def _q():
            hbuf[:] = ln(xres[:].astype(jnp.float32), 6 * C).astype(cdtype)
            qbuf[:] = proj(hbuf[:], bias_off=0)
            # per-head query columns, pre-scaled for self-attention
            qcol[:] = (to_col3(qbuf[:]) * D**-0.25).astype(cdtype)

        @pl.when(c == 1)  # k_new
        def _k():
            k = proj(hbuf[:])
            kvbuf[0] = k
            knew_ref[0] = k

        def _self_attention_row(b):
            """Self-attention for query row b against its own cache rows
            (sk_ref/sv_ref row b).  Writes the attended head outputs into
            hbuf row b for the o projection."""
            scale = D**-0.25
            q3 = qcol[:, :, b : b + 1]  # (H, D, 1), pre-scaled
            kc = (sk_ref[0, b] * scale).astype(cdtype)  # (H, D, T)
            s_old = jnp.sum(
                q3.astype(jnp.float32) * kc.astype(jnp.float32),
                axis=1, keepdims=True,
            )  # (H, 1, T) f32
            pos_ok = (
                jax.lax.broadcasted_iota(jnp.int32, (H, 1, T), 2) < t_now
            )
            s_old = jnp.where(pos_ok, s_old, NEG_INF)
            kn3 = (to_col3(kvbuf[0, b : b + 1]) * scale).astype(cdtype)
            s_new = jnp.sum(
                (q3 * kn3).astype(jnp.float32), axis=1, keepdims=True
            )  # (H, 1, 1)
            if has_pending:
                pk_ref, pv_ref = maybe_pend
                kp = (pk_ref[0, 0] * scale).astype(cdtype)  # (H, D, W)
                s_pend = jnp.sum(
                    q3.astype(jnp.float32) * kp.astype(jnp.float32),
                    axis=1, keepdims=True,
                )  # (H, 1, W)
                pend_ok = (
                    jax.lax.broadcasted_iota(jnp.int32, (H, 1, W), 2) < w_now
                )
                s_pend = jnp.where(pend_ok, s_pend, NEG_INF)
                m = jnp.maximum(
                    jnp.maximum(
                        jnp.max(s_old, axis=2, keepdims=True),
                        jnp.max(s_pend, axis=2, keepdims=True),
                    ),
                    s_new,
                )
            else:
                m = jnp.maximum(jnp.max(s_old, axis=2, keepdims=True), s_new)
            # joint softmax over [cache | pending | new], no lane-axis concat
            p_old = jnp.exp(s_old - m)  # (H, 1, T)
            p_new = jnp.exp(s_new - m)  # (H, 1, 1)
            denom = jnp.sum(p_old, axis=2, keepdims=True) + p_new
            if has_pending:
                p_pend = jnp.exp(s_pend - m)  # (H, 1, W)
                denom = denom + jnp.sum(p_pend, axis=2, keepdims=True)
            w_old = (p_old / denom).astype(cdtype)
            w_new = p_new / denom  # (H, 1, 1) f32
            vc = sv_ref[0, b]  # (H, D, T)
            attn = jnp.sum(
                w_old.astype(jnp.float32) * vc.astype(jnp.float32),
                axis=2, keepdims=True,
            )  # (H, D, 1) f32
            if has_pending:
                w_pend = (p_pend / denom).astype(cdtype)
                attn = attn + jnp.sum(
                    w_pend.astype(jnp.float32)
                    * pv_ref[0, 0].astype(jnp.float32),
                    axis=2, keepdims=True,
                )
            attn = attn + w_new * to_col3(kvbuf[1, b : b + 1]).astype(jnp.float32)
            hbuf[b : b + 1] = to_row(attn.astype(cdtype))  # stash for o proj

        def _owner_col(cols, b):
            """Extract column b of an (H, D, B) buffer as (H, D, 1).

            A one-hot multiply + lane reduce: adding zeros is exact in any
            dtype, so this is a value-exact dynamic column gather that
            keeps the per-phase VPU work O(1) in B (computing all B rows'
            scores per phase would make the whole pass O(A*B) — measured
            as most of the multi kernel's overhead above the byte floor).
            """
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, B), 2) == b
            ).astype(cols.dtype)
            return jnp.sum(cols * oh, axis=2, keepdims=True)

        def _self_attention_multi(b, slot):
            """Row b's self-attention in the multi-audio layout: sk_ref/
            sv_ref hold rows [blk*SG, (blk+1)*SG)'s cache blocks this phase
            and row b sits in block slot ``slot``.  Compute is the proven
            B=1 shape on row b's extracted query column; only row b's
            output lands in hbuf, masked by row b's own cache boundary."""
            t_b = t_ref[1 + b]
            scale = D**-0.25
            q3 = _owner_col(qcol[:], b)  # (H, D, 1), pre-scaled
            kc = (sk_ref[0, slot] * scale).astype(cdtype)  # (H, D, T)
            s = jnp.sum(
                q3.astype(jnp.float32) * kc.astype(jnp.float32),
                axis=1, keepdims=True,
            )  # (H, 1, T) f32
            pos_ok = jax.lax.broadcasted_iota(jnp.int32, (H, 1, T), 2) < t_b
            s = jnp.where(pos_ok, s, NEG_INF)
            kn3 = (_owner_col(to_col3(kvbuf[0]), b) * scale).astype(cdtype)
            s_new = jnp.sum(
                (q3 * kn3).astype(jnp.float32), axis=1, keepdims=True
            )  # (H, 1, 1)
            if has_pending:
                pk_ref, pv_ref = maybe_pend
                kp = (pk_ref[0, slot] * scale).astype(cdtype)  # (H, D, W)
                s_pend = jnp.sum(
                    q3.astype(jnp.float32) * kp.astype(jnp.float32),
                    axis=1, keepdims=True,
                )  # (H, 1, W)
                pend_ok = (
                    jax.lax.broadcasted_iota(jnp.int32, (H, 1, W), 2) < w_now
                )
                s_pend = jnp.where(pend_ok, s_pend, NEG_INF)
                m = jnp.maximum(
                    jnp.maximum(
                        jnp.max(s, axis=2, keepdims=True),
                        jnp.max(s_pend, axis=2, keepdims=True),
                    ),
                    s_new,
                )
            else:
                m = jnp.maximum(jnp.max(s, axis=2, keepdims=True), s_new)
            p_old = jnp.exp(s - m)  # (H, 1, T)
            p_new = jnp.exp(s_new - m)  # (H, 1, 1)
            denom = jnp.sum(p_old, axis=2, keepdims=True) + p_new
            if has_pending:
                p_pend = jnp.exp(s_pend - m)
                denom = denom + jnp.sum(p_pend, axis=2, keepdims=True)
            attn = jnp.sum(
                ((p_old / denom).astype(cdtype)).astype(jnp.float32)
                * sv_ref[0, slot].astype(jnp.float32),
                axis=2, keepdims=True,
            )  # (H, D, 1) f32
            if has_pending:
                attn = attn + jnp.sum(
                    ((p_pend / denom).astype(cdtype)).astype(jnp.float32)
                    * pv_ref[0, slot].astype(jnp.float32),
                    axis=2, keepdims=True,
                )
            attn = attn + (p_new / denom) * _owner_col(
                to_col3(kvbuf[1]), b
            ).astype(jnp.float32)
            rows = to_row(attn.astype(cdtype))  # (1, C)
            keep = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0) == b
            hbuf[:] = jnp.where(keep, rows, hbuf[:])

        if B == 1:

            @pl.when(c == 2)  # v_new + full self-attention
            def _v_attn():
                v = proj(hbuf[:], bias_off=C)
                kvbuf[1] = v
                vnew_ref[0] = v
                _self_attention_row(0)

        elif not multi:

            @pl.when(c == 2)  # v_new (attention runs in its own phase)
            def _v():
                v = proj(hbuf[:], bias_off=C)
                kvbuf[1] = v
                vnew_ref[0] = v

            @pl.when(c == 3)  # self-attention, every query row vs its cache
            def _self_rows():
                for b in range(B):
                    _self_attention_row(b)

        else:

            @pl.when(c == 2)  # v_new (per-row attention phases follow)
            def _v_multi():
                v = proj(hbuf[:], bias_off=C)
                kvbuf[1] = v
                vnew_ref[0] = v

            @pl.when((c >= 3) & (c < 3 + n_self))  # rows [g*SG, (g+1)*SG)
            def _self_row_multi():
                blk = c - 3
                for i in range(SG):
                    _self_attention_multi(blk * SG + i, i)

        @pl.when(c == c_o)  # o proj + residual; ln2
        def _o():
            xres[:] = xres[:] + proj(hbuf[:], bias_off=2 * C)
            hbuf[:] = ln(xres[:].astype(jnp.float32), 8 * C).astype(cdtype)

        @pl.when(c == c_xq)  # xq; init streaming softmax
        def _xq():
            qbuf[:] = proj(hbuf[:], bias_off=3 * C)
            if x_int8:
                # fold d^-0.5 and per-channel K scales into q (as the XLA
                # int8 cross path does, models.whisper._cross_step_attention);
                # scales are (H, D, A) — one column per audio, broadcast
                # over the group at A == 1, exact per row at A == B
                qcol[:] = (
                    to_col3(qbuf[:]).astype(jnp.float32)
                    * (D**-0.5)
                    * xks_ref[0]
                ).astype(cdtype)
            else:
                qcol[:] = (to_col3(qbuf[:]) * D**-0.25).astype(cdtype)
            mrow[:] = jnp.full((H, B, 128), NEG_INF, jnp.float32)
            lrow[:] = jnp.zeros((H, B, 128), jnp.float32)
            xacc[:] = jnp.zeros((H, D, B), jnp.float32)

        @pl.when((c > c_xq) & (c < c_xo))  # cross-attention chunk
        def _cross():
            # within-audio time-chunk index (phases are audio-block-major)
            j = (c - c_xq - 1) % NTA if multi else (c - c_xq - 1)
            # int8 K/V convert straight to f32 — int8 values are exact in
            # both bf16 and f32, and Mosaic lacks a 3D int8->bf16 cast
            if not multi:
                if x_int8:
                    kc32 = xk_ref[0, 0].astype(jnp.float32)  # (H, D, TC)
                else:
                    scale = D**-0.25
                    kc32 = (xk_ref[0, 0] * scale).astype(cdtype).astype(jnp.float32)
                vc32 = xv_ref[0, 0].astype(jnp.float32)  # (H, D, TC); int8/bf16
            col = jax.lax.broadcasted_iota(jnp.int32, (H, 1, ta_chunk), 2)
            valid = col + j * ta_chunk < Ta
            if B == 1:
                # single row: VPU broadcast-reduce (the proven b=1 path)
                q3 = qcol[:, :, :1]  # (H, D, 1)
                s = jnp.sum(
                    q3.astype(jnp.float32) * kc32,
                    axis=1, keepdims=True,
                )  # (H, 1, TC) f32
                s = jnp.where(valid, s, NEG_INF)

                m_prev = mrow[:, :, :1]  # (H, 1, 1)
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
                corr = jnp.exp(m_prev - m_new)  # (H, 1, 1)
                p = jnp.exp(s - m_new)  # (H, 1, TC) f32
                pv = jnp.sum(
                    p.astype(cdtype).astype(jnp.float32) * vc32,
                    axis=2, keepdims=True,
                )  # (H, D, 1)
                mrow[:, :, :1] = m_new
                lrow[:, :, :1] = lrow[:, :, :1] * corr + jnp.sum(
                    p, axis=2, keepdims=True
                )
                xacc[:] = xacc[:] * corr + pv
            elif multi:
                # multi-audio: this phase holds CG audios' chunks — for
                # each, extract the owning row's query column, run the
                # proven B=1 compute shape (O(CG) VPU work per phase), and
                # scatter the online-softmax state update into that row's
                # column
                a_blk = (c - c_xq - 1) // NTA  # audio-block index (CG rows)
                for i in range(CG):
                    a_idx = a_blk * CG + i  # owning row
                    if x_int8:
                        kc32_i = xk_ref[0, i].astype(jnp.float32)
                    else:
                        kc32_i = (
                            (xk_ref[0, i] * D**-0.25)
                            .astype(cdtype).astype(jnp.float32)
                        )
                    vc32_i = xv_ref[0, i].astype(jnp.float32)
                    q3 = _owner_col(qcol[:], a_idx)  # (H, D, 1)
                    s = jnp.sum(
                        q3.astype(jnp.float32) * kc32_i, axis=1, keepdims=True
                    )  # (H, 1, TC) f32
                    s = jnp.where(valid, s, NEG_INF)

                    own_b = (
                        jax.lax.broadcasted_iota(jnp.int32, (H, B, 1), 1)
                        == a_idx
                    )

                    def _owner_row(state, own_b=own_b):  # (H, B, 1) -> (H, 1, 1)
                        return jnp.sum(
                            state * own_b.astype(state.dtype),
                            axis=1, keepdims=True,
                        )

                    m_prev = _owner_row(mrow[:, :, :1])  # (H, 1, 1)
                    m_new = jnp.maximum(
                        m_prev, jnp.max(s, axis=2, keepdims=True)
                    )
                    corr = jnp.exp(m_prev - m_new)  # (H, 1, 1)
                    p = jnp.exp(s - m_new)  # (H, 1, TC) f32
                    pv = jnp.sum(
                        p.astype(cdtype).astype(jnp.float32) * vc32_i,
                        axis=2, keepdims=True,
                    )  # (H, D, 1)
                    l_new = _owner_row(lrow[:, :, :1]) * corr + jnp.sum(
                        p, axis=2, keepdims=True
                    )
                    x_new = _owner_col(xacc[:], a_idx) * corr + pv  # (H, D, 1)
                    mrow[:, :, :1] = jnp.where(own_b, m_new, mrow[:, :, :1])
                    lrow[:, :, :1] = jnp.where(own_b, l_new, lrow[:, :, :1])
                    own_l = (
                        jax.lax.broadcasted_iota(jnp.int32, (H, D, B), 2)
                        == a_idx
                    )
                    xacc[:] = jnp.where(own_l, x_new, xacc[:])
            else:
                # row group: per-head MXU dot_generals over all B rows at
                # once (same inputs as the row loop; f32 accumulation, MXU
                # summation order) — int8/bf16 K/V values are exact in the
                # compute dtype
                kc_c = kc32.astype(cdtype)  # (H, D, TC)
                vc_c = vc32.astype(cdtype)
                s = jax.lax.dot_general(
                    qcol[:], kc_c, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (H, B, TC) f32
                s = jnp.where(valid, s, NEG_INF)

                m_prev = mrow[:, :, :1]  # (H, B, 1)
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=2, keepdims=True))
                corr = jnp.exp(m_prev - m_new)  # (H, B, 1)
                p = jnp.exp(s - m_new)  # (H, B, TC) f32
                pv = jax.lax.dot_general(
                    vc_c, p.astype(cdtype), (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (H, D, B) f32
                mrow[:, :, :1] = m_new
                lrow[:, :, :1] = lrow[:, :, :1] * corr + jnp.sum(
                    p, axis=2, keepdims=True
                )
                xacc[:] = xacc[:] * jnp.transpose(corr, (0, 2, 1)) + pv

        @pl.when(c == c_xo)  # finish cross-attn; xo proj + residual; ln3
        def _xo():
            denom = jnp.transpose(lrow[:, :, :1], (0, 2, 1))  # (H, 1, B)
            out = xacc[:] / denom  # (H, D, B)
            if x_int8:
                out = out * xvs_ref[0]  # (H, D, A): per-audio V scales
            hbuf[:] = to_row(out.astype(cdtype))
            xres[:] = xres[:] + proj(hbuf[:], bias_off=4 * C)
            hbuf[:] = ln(xres[:].astype(jnp.float32), 10 * C).astype(cdtype)

        for i in range(4):

            @pl.when(c == c_fc1 + i)  # fc1 column block + GELU
            def _fc1(i=i):
                y = jnp.dot(
                    hbuf[:], w_ref[0, 0].astype(cdtype),
                    preferred_element_type=jnp.float32,
                )
                y = y * ws_ref[0, 0, 0][None]
                y = y + consts_ref[0, 0, 12 * C + i * C : 12 * C + (i + 1) * C][None]
                fbuf[:, i * C : (i + 1) * C] = _gelu_f32(y).astype(cdtype)

        for i in range(4):

            @pl.when(c == c_fc2 + i)  # fc2 row block
            def _fc2(i=i):
                part = jnp.dot(
                    fbuf[:, i * C : (i + 1) * C], w_ref[0, 0].astype(cdtype),
                    preferred_element_type=jnp.float32,
                )
                if i == 0:
                    facc[:] = part
                else:
                    facc[:] = facc[:] + part

        @pl.when(c == c_fc2 + 3)  # close the layer
        def _close():
            y = facc[:] * ws_ref[0, 0, 0][None]
            y = y.astype(cdtype) + consts_ref[0, 0, 5 * C : 6 * C][None].astype(cdtype)
            xres[:] = xres[:] + y

            @pl.when(l == L - 1)
            def _final():
                out_ref[:] = xres[:]

    if has_pending:

        def kernel(t_ref, x_ref, w_ref, ws_ref, consts_ref, sk_ref, sv_ref,
                   xk_ref, xv_ref, xks_ref, xvs_ref, pk_ref, pv_ref,
                   out_ref, knew_ref, vnew_ref, *scratch):
            _kernel_body(
                t_ref, x_ref, w_ref, ws_ref, consts_ref, sk_ref, sv_ref,
                xk_ref, xv_ref, xks_ref, xvs_ref, (pk_ref, pv_ref),
                out_ref, knew_ref, vnew_ref, *scratch,
            )
    else:

        def kernel(t_ref, x_ref, w_ref, ws_ref, consts_ref, sk_ref, sv_ref,
                   xk_ref, xv_ref, xks_ref, xvs_ref,
                   out_ref, knew_ref, vnew_ref, *scratch):
            _kernel_body(
                t_ref, x_ref, w_ref, ws_ref, consts_ref, sk_ref, sv_ref,
                xk_ref, xv_ref, xks_ref, xvs_ref, (),
                out_ref, knew_ref, vnew_ref, *scratch,
            )

    from jax.experimental.pallas import tpu as pltpu  # noqa: F811

    grid = (L, NC)
    out_shapes = (
        jax.ShapeDtypeStruct((B, C), cdtype),
        jax.ShapeDtypeStruct((L, B, C), cdtype),
        jax.ShapeDtypeStruct((L, B, C), cdtype),
    )
    if multi:
        # grouped cache blocks stream SG rows per self phase; pending
        # blocks stream the matching rows
        self_spec = pl.BlockSpec(
            (1, SG, H, D, T), self_row_index, memory_space=pltpu.VMEM
        )
        pend_spec = pl.BlockSpec(
            (1, SG, H, D, W or 1), self_row_index, memory_space=pltpu.VMEM
        )
    else:
        self_spec = pl.BlockSpec(
            (1, B, H, D, T), lambda l, c: (l, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        pend_spec = pl.BlockSpec(
            (1, B, H, D, W or 1), lambda l, c: (l, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    # VMEM budget: the tile-padded demand of the chosen block set (the
    # shrink loop above already guarantees demand <= _VMEM_CEIL).  The v5e
    # accepts budgets well above the 16 MB planning default; the grouped
    # multi layout needs ~45-80 MB.
    vmem_budget = min(
        max(vmem_demand(SG, CG, ta_chunk), 48 * 1024 * 1024), _VMEM_CEIL
    )
    if os.environ.get("WHISPER_TPU_FUSED_DEBUG"):
        print(
            f"fused_step: B={B} A={A} T={T} Ta_pad={Ta_pad} W={W} "
            f"SG={SG} CG={CG} tc={ta_chunk} NC={NC} grid={L}x{NC} "
            f"vmem_budget={vmem_budget / 2**20:.2f} MiB",
            flush=True,
        )
    kernel_call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [w, t_0..t_{B-1}]
            pl.BlockSpec((B, C), lambda l, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C, C), w_tile_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, 1, C), lambda l, c: (*w_tile_index(l, c)[:2], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 16 * C), lambda l, c: (l, 0, 0), memory_space=pltpu.VMEM
            ),
            self_spec,
            self_spec,
            pl.BlockSpec(
                (1, CG, H, D, ta_chunk), cross_chunk_index, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, CG, H, D, ta_chunk), cross_chunk_index, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, H, D, A), lambda l, c: (l, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, H, D, A), lambda l, c: (l, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + ([pend_spec, pend_spec] if has_pending else []),
        out_specs=(
            pl.BlockSpec((B, C), lambda l, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, C), lambda l, c: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, C), lambda l, c: (l, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((B, C), cdtype),  # xres
            pltpu.VMEM((B, C), cdtype),  # hbuf
            pltpu.VMEM((B, C), cdtype),  # qbuf
            pltpu.VMEM((2, B, C), cdtype),  # kvbuf
            pltpu.VMEM((B, 4 * C), cdtype),  # fbuf
            pltpu.VMEM((B, C), jnp.float32),  # facc
            pltpu.VMEM((H, B, 128), jnp.float32),  # mrow
            pltpu.VMEM((H, B, 128), jnp.float32),  # lrow
            pltpu.VMEM((H, D, B), jnp.float32),  # xacc
            pltpu.VMEM((H, D, B), cdtype),  # qcol
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # B>1: double-buffered block copies dominate VMEM — size the
            # compiler's budget from the actual specs (grouped multi-audio
            # blocks are the big ones: SG self rows + CG cross audios),
            # min 48 MB (the proven beam-group budget)
            **({"vmem_limit_bytes": vmem_budget} if B > 1 else {}),
        ),
        interpret=interpret,
    )
    t_vec = jnp.broadcast_to(t, (B,)).astype(jnp.int32)
    w_scal = (
        pend_w.astype(jnp.int32) if has_pending else jnp.int32(0)
    )
    scal = jnp.concatenate([w_scal[None], t_vec])
    args = [scal, x, pack.w, pack.ws, pack.consts, self_k, self_v, xk, xv, xk_s, xv_s]
    if has_pending:
        args += [pend_k, pend_v]
    hidden, k_new, v_new = kernel_call(*args)
    return hidden, k_new, v_new

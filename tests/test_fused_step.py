"""Whole-step fused decode kernel: parity with the XLA layer scan.

The kernel (ops/kernels/fused_step_pallas.py) runs all decoder layers of
one decode step in a single pallas_call; off-TPU it executes under the
Pallas interpreter, so these tests exercise the REAL kernel body on CPU.
Contract: outputs agree with models.whisper.decoder_step to compute-dtype
rounding, and the fused engine decodes the same tokens as the XLA engine.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.decoding import DecodingOptions, DecodingTask
from whisper_tpu.models.dims import ModelDimensions
from whisper_tpu.models.whisper import (
    Whisper,
    compute_cross_kv,
    decoder_step,
    decoder_step_fused,
    init_kv_cache,
    init_params,
)
from whisper_tpu.ops.kernels.fused_step_pallas import (
    pack_fused_weights,
    pad_cross_kv,
)
from whisper_tpu.quantize import quantize_kv, quantize_params

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=128, n_audio_head=2,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=128,
    n_text_head=2, n_text_layer=3,
)


@pytest.fixture(scope="module")
def params():
    return init_params(DIMS, jax.random.PRNGKey(0), jnp.float32)


@pytest.fixture(scope="module")
def feats():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(1, 1500, 128) * 0.3, jnp.float32)


@pytest.mark.parametrize("quantize,kv_int8", [
    (False, False), (True, False), (True, True), (False, True),
])
def test_fused_step_matches_decoder_step(params, feats, quantize, kv_int8):
    p = quantize_params(params, scopes=("decoder",)) if quantize else params
    xk, xv = compute_cross_kv(p, DIMS, feats)
    xk_c = quantize_kv(xk) if kv_int8 else xk
    xv_c = quantize_kv(xv) if kv_int8 else xv

    T, t0 = 64, 7
    cache = init_kv_cache(DIMS, 1, xk_c, xv_c, jnp.float32, ctx=T)
    rng = np.random.RandomState(1)
    sk = rng.randn(*cache.self_k.shape).astype(np.float32) * 0.1
    sk[..., t0:] = 0
    sv = rng.randn(*cache.self_v.shape).astype(np.float32) * 0.1
    sv[..., t0:] = 0
    cache = cache._replace(self_k=jnp.asarray(sk), self_v=jnp.asarray(sv))

    tokens = jnp.asarray([42], jnp.int32)
    hid_ref, cache_ref = decoder_step(p, DIMS, tokens, jnp.int32(t0), cache)

    pack = pack_fused_weights(p, DIMS)
    xkp, xvp, xks, xvs = pad_cross_kv(xk_c, xv_c)
    hid, cache_f = decoder_step_fused(
        p, pack, DIMS, tokens, jnp.int32(t0), cache, xkp, xvp, xks, xvs
    )

    np.testing.assert_allclose(
        np.asarray(hid), np.asarray(hid_ref), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache_f.self_k), np.asarray(cache_ref.self_k), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cache_f.self_v), np.asarray(cache_ref.self_v), atol=1e-5
    )


@pytest.mark.parametrize("quantize,kv_int8", [(False, False), (True, True)])
def test_fused_step_matches_decoder_step_grouped(params, feats, quantize, kv_int8):
    """B=5 rows (one audio's beam/best-of group) parity with the XLA step."""
    G = 5
    p = quantize_params(params, scopes=("decoder",)) if quantize else params
    xk, xv = compute_cross_kv(p, DIMS, feats)  # (L, 1, H, D, Ta)
    xk_c = quantize_kv(xk) if kv_int8 else xk
    xv_c = quantize_kv(xv) if kv_int8 else xv

    T, t0 = 64, 9
    cache = init_kv_cache(DIMS, G, xk_c, xv_c, jnp.float32, ctx=T)
    rng = np.random.RandomState(2)
    sk = rng.randn(*cache.self_k.shape).astype(np.float32) * 0.1
    sk[..., t0:] = 0  # rows hold distinct histories up to t0
    sv = rng.randn(*cache.self_v.shape).astype(np.float32) * 0.1
    sv[..., t0:] = 0
    cache = cache._replace(self_k=jnp.asarray(sk), self_v=jnp.asarray(sv))

    tokens = jnp.asarray([11, 22, 33, 44, 55], jnp.int32)
    hid_ref, cache_ref = decoder_step(
        p, DIMS, tokens, jnp.int32(t0), cache, n_group=G
    )

    pack = pack_fused_weights(p, DIMS)
    xkp, xvp, xks, xvs = pad_cross_kv(xk_c, xv_c)
    hid, cache_f = decoder_step_fused(
        p, pack, DIMS, tokens, jnp.int32(t0), cache, xkp, xvp, xks, xvs
    )

    np.testing.assert_allclose(
        np.asarray(hid), np.asarray(hid_ref), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache_f.self_k), np.asarray(cache_ref.self_k), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cache_f.self_v), np.asarray(cache_ref.self_v), atol=1e-5
    )


@pytest.fixture(scope="module")
def model(params):
    return Whisper(DIMS, params)


@pytest.fixture(scope="module")
def mel():
    rng = np.random.RandomState(3)
    return jnp.asarray(rng.randn(1, 80, 3000) * 0.4, jnp.float32)


@pytest.mark.parametrize("kw", [
    {},
    {"without_timestamps": True},
    {"prompt": "previous context words"},
    {"kv_cache_dtype": "int8"},
])
def test_fused_engine_token_parity(model, mel, kw):
    """The fused engine decodes the same tokens as the XLA engine."""
    base = DecodingOptions(
        language="en", temperature=0.0, sample_len=6, **kw
    )
    plain = DecodingTask(
        model, dataclasses.replace(base, fused_step=False)
    ).run(mel)
    fused_task = DecodingTask(model, dataclasses.replace(base, fused_step=True))
    spec, pack = fused_task._fused_variant(fused_task.spec, 1)
    assert spec.fused_step and pack is not None  # eligibility sanity
    fused = fused_task.run(mel)
    assert plain[0].tokens == fused[0].tokens
    assert abs(plain[0].avg_logprob - fused[0].avg_logprob) < 1e-4


@pytest.mark.parametrize("kw", [
    {"beam_size": 3},
    {"beam_size": 2, "patience": 2.0},
    {"beam_size": 2, "kv_cache_dtype": "int8"},
    {"temperature": 0.7, "best_of": 3, "seed": 7},
])
def test_fused_engine_group_token_parity(model, mel, kw):
    """Beam / best-of groups decode the same tokens fused as via XLA."""
    temperature = kw.pop("temperature", 0.0)
    base = DecodingOptions(
        language="en", temperature=temperature, sample_len=6, **kw
    )
    plain = DecodingTask(
        model, dataclasses.replace(base, fused_step=False)
    ).run(mel)
    fused_task = DecodingTask(model, dataclasses.replace(base, fused_step=True))
    spec, pack = fused_task._fused_variant(fused_task.spec, 1)
    assert spec.fused_step and pack is not None and spec.write_block == 0
    fused = fused_task.run(mel)
    assert plain[0].tokens == fused[0].tokens
    assert abs(plain[0].avg_logprob - fused[0].avg_logprob) < 1e-4


def test_fused_auto_off_on_cpu(model, mel):
    """Auto policy keeps the XLA engine off-TPU (interpreter is test-only)."""
    task = DecodingTask(model, DecodingOptions(language="en", sample_len=2))
    spec, pack = task._fused_variant(task.spec, 1)
    assert not spec.fused_step and pack is None


def test_fused_eligible_beam_single_audio(model):
    # single-audio beam groups use the fused kernel (rows share cross-KV);
    # pending write blocks stay off for grouped rows
    task = DecodingTask(
        model,
        DecodingOptions(language="en", beam_size=2, fused_step=True, sample_len=2),
    )
    spec, pack = task._fused_variant(task.spec, 1)
    assert spec.fused_step and pack is not None
    assert spec.write_block == 0


def test_fused_eligible_batch_greedy(model):
    # multi-audio greedy batches use the fused kernel's per-row layout,
    # and keep deferred write blocks (per-row pending blocks)
    task = DecodingTask(
        model, DecodingOptions(language="en", fused_step=True, sample_len=2)
    )
    task.spec = dataclasses.replace(task.spec, write_block=4)
    spec, pack = task._fused_variant(task.spec, 2)
    assert spec.fused_step and pack is not None
    assert spec.write_block == 4


def test_fused_ineligible_batch_group(model):
    # multi-audio WITH row groups (best-of sampling over a batch) stays on
    # the XLA engine: the kernel serves A == 1 or A == B only
    task = DecodingTask(
        model,
        DecodingOptions(
            language="en", temperature=0.7, best_of=3, fused_step=True,
            sample_len=2,
        ),
    )
    spec, pack = task._fused_variant(task.spec, 2)
    assert not spec.fused_step


@pytest.mark.parametrize("quantize,kv_int8", [(False, False), (True, True)])
def test_fused_pending_matches_decoder_step_pending(params, feats, quantize, kv_int8):
    """Kernel pending-block attention ([cache | pending | new]) parity."""
    from whisper_tpu.models.whisper import (
        decoder_step_fused_pending,
        decoder_step_pending,
    )

    p = quantize_params(params, scopes=("decoder",)) if quantize else params
    xk, xv = compute_cross_kv(p, DIMS, feats)
    xk_c = quantize_kv(xk) if kv_int8 else xk
    xv_c = quantize_kv(xv) if kv_int8 else xv

    T, bs, w, W = 64, 9, 2, 4  # block starts at 9; cols 0..1 already pending
    cache = init_kv_cache(DIMS, 1, xk_c, xv_c, jnp.float32, ctx=T)
    rng = np.random.RandomState(2)
    sk = rng.randn(*cache.self_k.shape).astype(np.float32) * 0.1
    sk[..., bs:] = 0
    sv = rng.randn(*cache.self_v.shape).astype(np.float32) * 0.1
    sv[..., bs:] = 0
    cache = cache._replace(self_k=jnp.asarray(sk), self_v=jnp.asarray(sv))
    L, B, H = DIMS.n_text_layer, 1, DIMS.n_text_head
    D = DIMS.n_text_state // H
    pend_k = jnp.asarray(rng.randn(L, B, H, D, W).astype(np.float32) * 0.1)
    pend_v = jnp.asarray(rng.randn(L, B, H, D, W).astype(np.float32) * 0.1)

    tokens = jnp.asarray([7], jnp.int32)
    t = jnp.int32(bs + w)
    h_ref, pk_ref, pv_ref = decoder_step_pending(
        p, DIMS, tokens, t, jnp.int32(bs), jnp.int32(w), pend_k, pend_v, cache
    )
    pack = pack_fused_weights(p, DIMS)
    xkp, xvp, xks, xvs = pad_cross_kv(xk_c, xv_c)
    h, pk, pv = decoder_step_fused_pending(
        p, pack, DIMS, tokens, t, jnp.int32(bs), jnp.int32(w),
        pend_k, pend_v, cache, xkp, xvp, xks, xvs,
    )
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(pk_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pv_ref), atol=1e-5)


@pytest.mark.parametrize("quantize,kv_int8,A", [
    # A=3: SG=3 grouped self phase, CG=1; A=4: SG=4 AND CG=2 grouped
    # cross phases (two audios' chunks per phase)
    (False, False, 3), (True, False, 3), (True, True, 3), (False, True, 3),
    (False, False, 4), (True, True, 4),
])
def test_fused_step_matches_decoder_step_multi(params, feats, quantize, kv_int8, A):
    """A=B multi-audio rows with per-row positions parity with XLA."""
    p = quantize_params(params, scopes=("decoder",)) if quantize else params
    scales = [1.0, 0.7, -0.4, 1.3][:A]
    feats3 = jnp.concatenate([feats * s for s in scales], axis=0)
    xk, xv = compute_cross_kv(p, DIMS, feats3)  # (L, A, H, D, Ta)
    xk_c = quantize_kv(xk) if kv_int8 else xk
    xv_c = quantize_kv(xv) if kv_int8 else xv

    T = 64
    positions = [7, 12, 3, 30][:A]
    t_rows = jnp.asarray(positions, jnp.int32)  # heterogeneous positions
    cache = init_kv_cache(DIMS, A, xk_c, xv_c, jnp.float32, ctx=T)
    rng = np.random.RandomState(4)
    sk = rng.randn(*cache.self_k.shape).astype(np.float32) * 0.1
    sv = rng.randn(*cache.self_v.shape).astype(np.float32) * 0.1
    for b, tb in enumerate(positions):  # zero beyond each row's boundary
        sk[:, b, ..., tb:] = 0
        sv[:, b, ..., tb:] = 0
    cache = cache._replace(self_k=jnp.asarray(sk), self_v=jnp.asarray(sv))

    tokens = jnp.asarray([42, 7, 300, 1999][:A], jnp.int32)
    hid_ref, cache_ref = decoder_step(p, DIMS, tokens, t_rows, cache)

    pack = pack_fused_weights(p, DIMS)
    xkp, xvp, xks, xvs = pad_cross_kv(xk_c, xv_c)
    hid, cache_f = decoder_step_fused(
        p, pack, DIMS, tokens, t_rows, cache, xkp, xvp, xks, xvs
    )

    np.testing.assert_allclose(
        np.asarray(hid), np.asarray(hid_ref), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache_f.self_k), np.asarray(cache_ref.self_k), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cache_f.self_v), np.asarray(cache_ref.self_v), atol=1e-5
    )


@pytest.mark.parametrize("quantize,kv_int8", [(False, False), (True, True)])
def test_fused_pending_matches_multi(params, feats, quantize, kv_int8):
    """Multi-audio pending blocks: per-row [cache | pending | new] parity."""
    from whisper_tpu.models.whisper import (
        decoder_step_fused_pending,
        decoder_step_pending,
    )

    A = 3
    p = quantize_params(params, scopes=("decoder",)) if quantize else params
    feats3 = jnp.concatenate([feats, feats * 0.5, feats * 1.3], axis=0)
    xk, xv = compute_cross_kv(p, DIMS, feats3)
    xk_c = quantize_kv(xk) if kv_int8 else xk
    xv_c = quantize_kv(xv) if kv_int8 else xv

    T, w, W = 64, 2, 4
    bs_rows = jnp.asarray([9, 5, 14], jnp.int32)  # per-row block starts
    cache = init_kv_cache(DIMS, A, xk_c, xv_c, jnp.float32, ctx=T)
    rng = np.random.RandomState(5)
    sk = rng.randn(*cache.self_k.shape).astype(np.float32) * 0.1
    sv = rng.randn(*cache.self_v.shape).astype(np.float32) * 0.1
    for b, tb in enumerate([9, 5, 14]):
        sk[:, b, ..., tb:] = 0
        sv[:, b, ..., tb:] = 0
    cache = cache._replace(self_k=jnp.asarray(sk), self_v=jnp.asarray(sv))
    L, H = DIMS.n_text_layer, DIMS.n_text_head
    D = DIMS.n_text_state // H
    pend_k = jnp.asarray(rng.randn(L, A, H, D, W).astype(np.float32) * 0.1)
    pend_v = jnp.asarray(rng.randn(L, A, H, D, W).astype(np.float32) * 0.1)

    tokens = jnp.asarray([7, 99, 1234], jnp.int32)
    t = bs_rows + w
    h_ref, pk_ref, pv_ref = decoder_step_pending(
        p, DIMS, tokens, t, bs_rows, jnp.int32(w), pend_k, pend_v, cache
    )
    pack = pack_fused_weights(p, DIMS)
    xkp, xvp, xks, xvs = pad_cross_kv(xk_c, xv_c)
    h, pk, pv = decoder_step_fused_pending(
        p, pack, DIMS, tokens, t, bs_rows, jnp.int32(w),
        pend_k, pend_v, cache, xkp, xvp, xks, xvs,
    )
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(pk_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pv_ref), atol=1e-5)


def test_fused_engine_token_parity_multi(model):
    """A batch of 2 distinct audios decodes the same tokens fused as XLA."""
    rng = np.random.RandomState(8)
    mel2 = jnp.asarray(rng.randn(2, 80, 3000) * 0.4, jnp.float32)
    base = DecodingOptions(language="en", temperature=0.0, sample_len=6)
    plain = DecodingTask(
        model, dataclasses.replace(base, fused_step=False)
    ).run(mel2)
    fused_task = DecodingTask(model, dataclasses.replace(base, fused_step=True))
    spec, pack = fused_task._fused_variant(fused_task.spec, 2)
    assert spec.fused_step and pack is not None
    fused = fused_task.run(mel2)
    for i in range(2):
        assert plain[i].tokens == fused[i].tokens
        assert abs(plain[i].avg_logprob - fused[i].avg_logprob) < 1e-4


def test_fused_write_block_engine_token_parity(model, mel):
    """Fused engine with deferred KV write blocks decodes the same tokens.

    kv_cache_dtype="int8" keeps write_block through the all-bf16 gate
    (the gate disables pending blocks only for fully-bf16 configs).
    """
    base = DecodingOptions(
        language="en", temperature=0.0, sample_len=7, kv_cache_dtype="int8"
    )
    plain = DecodingTask(
        model, dataclasses.replace(base, fused_step=False)
    ).run(mel)
    task = DecodingTask(model, dataclasses.replace(base, fused_step=True))
    # test dims are narrow (write_block auto-off); force the block engine
    task.spec = dataclasses.replace(task.spec, write_block=4)
    spec, pack = task._fused_variant(task.spec, 1)
    assert spec.fused_step and spec.write_block == 4
    fused = task.run(mel)
    assert plain[0].tokens == fused[0].tokens
    assert abs(plain[0].avg_logprob - fused[0].avg_logprob) < 1e-4


def test_fused_compile_failure_falls_back(params, mel, monkeypatch):
    """An auto-selected fused kernel that fails to compile/run degrades to
    the XLA engine: warning once, correct tokens, and the failed
    configuration remembered so later decodes skip the kernel entirely.
    Reference parity: whisper/timing.py:36-45,142-149 (Triton -> CPU on
    RuntimeError).  BENCH_r04 died for lack of exactly this fallback.
    """
    import whisper_tpu.decoding as decoding_mod
    from whisper_tpu.ops.kernels import fused_step_pallas

    m = Whisper(DIMS, params)  # fresh model: failure cache is per-model
    base = DecodingOptions(language="en", temperature=0.0, sample_len=6)
    plain = DecodingTask(m, dataclasses.replace(base, fused_step=False)).run(mel)

    # pretend we're on TPU so the AUTO policy (fused_step=None) selects the
    # kernel, and make the kernel die like a Mosaic VMEM compile failure
    monkeypatch.setattr(decoding_mod, "_FUSED_AUTO_BACKENDS", ("tpu", "cpu"))
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError(
            "Ran out of memory in memory space vmem while allocating (test)"
        )

    monkeypatch.setattr(fused_step_pallas, "fused_decoder_layers", boom)
    # earlier tests traced an identical fused decode_engine program; a jit
    # cache hit would skip the (call-time-imported) kernel entirely — clear
    # so the trace re-runs and actually reaches the failing kernel
    jax.clear_caches()

    task = DecodingTask(m, base)
    spec, pack = task._fused_variant(task.spec, 1)
    assert spec.fused_step and pack is not None  # auto policy took the kernel
    with pytest.warns(UserWarning, match="falling back to the XLA engine"):
        result = task.run(mel)
    assert calls["n"] == 1
    assert result[0].tokens == plain[0].tokens
    assert abs(result[0].avg_logprob - plain[0].avg_logprob) < 1e-4
    assert m._fused_bad  # verdict cached on the model

    # a later task on the same model never re-tries the failed configuration
    task2 = DecodingTask(m, base)
    spec2, pack2 = task2._fused_variant(task2.spec, 1)
    assert not spec2.fused_step and pack2 is None
    result2 = task2.run(mel)
    assert calls["n"] == 1  # kernel not touched again
    assert result2[0].tokens == plain[0].tokens


def test_fused_explicit_true_reraises(params, mel, monkeypatch):
    """options.fused_step=True disables the fallback: kernel failures are
    the caller's to see (tests and kernel work want the real error)."""
    from whisper_tpu.ops.kernels import fused_step_pallas

    m = Whisper(DIMS, params)

    def boom(*a, **k):
        raise RuntimeError("mosaic lowering failed (test)")

    monkeypatch.setattr(fused_step_pallas, "fused_decoder_layers", boom)
    jax.clear_caches()  # force a retrace through the monkeypatched kernel
    task = DecodingTask(
        m, DecodingOptions(language="en", sample_len=2, fused_step=True)
    )
    with pytest.raises(RuntimeError, match="mosaic lowering failed"):
        task.run(mel)
    assert not getattr(m, "_fused_bad", None)  # no verdict cached


def test_fused_explicit_true_bypasses_failure_cache(params, mel, monkeypatch):
    """A cached auto-mode failure must NOT reroute an explicit
    fused_step=True around the kernel: its contract is 'give me the kernel
    and its real error', which is how kernel bugs get reproduced after the
    auto path has degraded."""
    from whisper_tpu.ops.kernels import fused_step_pallas

    m = Whisper(DIMS, params)
    task_true = DecodingTask(
        m, DecodingOptions(language="en", sample_len=2, fused_step=True)
    )
    # pre-poison the failure cache exactly as an auto-mode failure would
    m._fused_bad = {task_true._fused_fail_key(1): "RuntimeError (earlier)"}

    spec, pack = task_true._fused_variant(task_true.spec, 1)
    assert spec.fused_step and pack is not None  # cache did not reroute

    def boom(*a, **k):
        raise RuntimeError("mosaic lowering failed (test)")

    monkeypatch.setattr(fused_step_pallas, "fused_decoder_layers", boom)
    jax.clear_caches()
    with pytest.raises(RuntimeError, match="mosaic lowering failed"):
        task_true.run(mel)


def test_fused_compile_failure_falls_back_run_with_prompts(
    params, mel, monkeypatch
):
    """The fallback covers run_with_prompts too — the engine path behind
    transcribe_batch and the serving layer, where a fused compile failure
    previously killed the request instead of degrading."""
    import whisper_tpu.decoding as decoding_mod
    from whisper_tpu.ops.kernels import fused_step_pallas

    m = Whisper(DIMS, params)
    base = DecodingOptions(language="en", temperature=0.0, sample_len=6)
    prompts = [[token] for token in (42,)]
    plain = DecodingTask(
        m, dataclasses.replace(base, fused_step=False)
    ).run_with_prompts(mel, prompts)

    monkeypatch.setattr(decoding_mod, "_FUSED_AUTO_BACKENDS", ("tpu", "cpu"))

    def boom(*a, **k):
        raise RuntimeError(
            "Ran out of memory in memory space vmem while allocating (test)"
        )

    monkeypatch.setattr(fused_step_pallas, "fused_decoder_layers", boom)
    jax.clear_caches()

    task = DecodingTask(m, base)
    with pytest.warns(UserWarning, match="falling back to the XLA engine"):
        result = task.run_with_prompts(mel, prompts)
    assert result[0].tokens == plain[0].tokens
    assert m._fused_bad  # verdict cached for the serving path's config


# ---------------------------------------------------------------------------
# VMEM budget machinery (the round-4 bench crash class).
# ---------------------------------------------------------------------------


def test_block_bytes_tile_padding():
    """Mosaic pads the last two dims to (sublane, 128) tiles with the
    sublane multiple set by element width — raw prod(shape)*itemsize
    undercounts narrow-minor blocks (how BENCH_r04's budget came in
    1.65 MB short)."""
    from whisper_tpu.ops.kernels import fused_step_pallas as fsp

    # narrow minor dim: (H, D, B) f32 at B=16 pads 16 -> 128 lanes
    assert fsp._block_bytes((20, 64, 16), jnp.float32) == 20 * 64 * 128 * 4
    # bf16 sublane multiple is 16: second-to-minor 20 -> 32
    assert fsp._block_bytes((20, 1280), jnp.bfloat16) == 32 * 1280 * 2
    # int8 sublane multiple is 32
    assert fsp._block_bytes((8, 256), jnp.int8) == 32 * 256
    # 1-D shapes get a leading sublane dim
    assert fsp._block_bytes((300,), jnp.float32) == 8 * 384 * 4
    # already tile-aligned: exact
    assert fsp._block_bytes((8, 128), jnp.float32) == 8 * 128 * 4


def test_shrink_blocks_order_and_termination():
    """The shrink loop reduces cross chunks first (down to the 512
    baseline), then self groups, then cross groups, then chunks below the
    baseline — and always terminates at the minimal set."""
    from whisper_tpu.ops.kernels.fused_step_pallas import _shrink_blocks

    B, A, Ta_pad = 16, 16, 1536

    # fits immediately: untouched
    assert _shrink_blocks(
        lambda sg, cg, tc: 1, B, A, Ta_pad, 8, 2, 1536, ceil=100
    ) == (8, 2, 1536)

    # demand dominated by tc: only the chunk shrinks (1536 -> 512 baseline)
    sg, cg, tc = _shrink_blocks(
        lambda sg, cg, tc: tc, B, A, Ta_pad, 8, 2, 1536, ceil=600
    )
    assert (sg, cg, tc) == (8, 2, 512)

    # tc at baseline, still too big: SG shrinks next (divisors of B)
    sg, cg, tc = _shrink_blocks(
        lambda sg, cg, tc: sg * 100, B, A, Ta_pad, 8, 2, 512, ceil=250
    )
    assert (sg, cg, tc) == (2, 2, 512)

    # then CG, then sub-baseline chunks; impossible demand terminates at
    # the minimal block set instead of looping forever
    sg, cg, tc = _shrink_blocks(
        lambda sg, cg, tc: 10**9, B, A, Ta_pad, 8, 2, 1536, ceil=1
    )
    assert (sg, cg, tc) == (1, 1, 128)


@pytest.mark.parametrize("ceil_mb", [40, 24])
def test_fused_multi_parity_under_small_vmem_ceiling(
    params, feats, monkeypatch, ceil_mb
):
    """Shrunken block sets (small SG/CG/ta_chunk) still compute the exact
    same step as the XLA path: the auto-shrink can change performance but
    never results."""
    from whisper_tpu.ops.kernels import fused_step_pallas as fsp

    monkeypatch.setattr(fsp, "_VMEM_CEIL", ceil_mb * 2**20)

    A = 4
    feats4 = jnp.concatenate(
        [feats * s for s in (1.0, 0.7, -0.4, 1.3)], axis=0
    )
    xk, xv = compute_cross_kv(params, DIMS, feats4)
    T = 64
    positions = [7, 12, 3, 30]
    t_rows = jnp.asarray(positions, jnp.int32)
    cache = init_kv_cache(DIMS, A, xk, xv, jnp.float32, ctx=T)
    rng = np.random.RandomState(4)
    sk = rng.randn(*cache.self_k.shape).astype(np.float32) * 0.1
    sv = rng.randn(*cache.self_v.shape).astype(np.float32) * 0.1
    for b, tb in enumerate(positions):
        sk[:, b, ..., tb:] = 0
        sv[:, b, ..., tb:] = 0
    cache = cache._replace(self_k=jnp.asarray(sk), self_v=jnp.asarray(sv))

    tokens = jnp.asarray([42, 7, 300, 1999], jnp.int32)
    hid_ref, cache_ref = decoder_step(params, DIMS, tokens, t_rows, cache)

    pack = pack_fused_weights(params, DIMS)
    xkp, xvp, xks, xvs = pad_cross_kv(xk, xv)
    hid, cache_f = decoder_step_fused(
        params, pack, DIMS, tokens, t_rows, cache, xkp, xvp, xks, xvs
    )
    np.testing.assert_allclose(
        np.asarray(hid), np.asarray(hid_ref), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cache_f.self_k), np.asarray(cache_ref.self_k), atol=1e-5
    )

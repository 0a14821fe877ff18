import numpy as np

import jax
import jax.numpy as jnp

import whisper_tpu
from whisper_tpu.models.dims import ModelDimensions
from whisper_tpu.models.whisper import Whisper, init_params
from whisper_tpu.quantize import (
    dequantize_weight,
    is_quantized,
    quantize_kv,
    quantize_params,
    quantize_weight,
)

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=64,
    n_text_head=2, n_text_layer=2,
)


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64)) * 0.05
    q = quantize_weight(w)
    assert q["q"].dtype == jnp.int8
    deq = dequantize_weight(q, jnp.float32)
    # per-channel int8: max error bounded by scale/2 = absmax/254
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(q["s"]) / 2 + 1e-9
    assert (err <= bound).all()


def test_quantize_params_structure():
    params = init_params(DIMS, jax.random.PRNGKey(0))
    qparams = quantize_params(params)
    assert is_quantized(qparams["decoder"]["blocks"]["q_w"])
    assert is_quantized(qparams["encoder"]["blocks"]["fc1_w"])
    # embeddings / norms / convs stay full precision
    assert not is_quantized(qparams["decoder"]["tok_emb"])
    assert not is_quantized(qparams["encoder"]["conv1_w"])
    assert not is_quantized(qparams["decoder"]["blocks"]["attn_ln_g"])


def test_cross_step_attention_int8_close():
    """int8 cross-KV attention tracks the full-precision path per-op."""
    from whisper_tpu.models.whisper import _cross_step_attention

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    A, H, D, Ta, G = 2, 4, 64, 256, 3
    xq = jax.random.normal(k1, (A * G, H, 1, D)) * 0.5
    xk = jax.random.normal(k2, (A, H, D, Ta)) * 0.5
    xv = jax.random.normal(k3, (A, H, D, Ta)) * 0.5

    full = _cross_step_attention(xq, xk, xv, H, G)
    q8 = _cross_step_attention(xq, quantize_kv(xk), quantize_kv(xv), H, G)
    err = np.max(np.abs(np.asarray(full) - np.asarray(q8)))
    ref = np.max(np.abs(np.asarray(full))) + 1e-9
    assert err / ref < 0.05, f"relative error {err / ref:.4f}"


def test_cross_step_attention_group_fold_exact():
    """Group-folded cross attention == per-row attention on tiled K/V."""
    from whisper_tpu.models.whisper import _cross_step_attention

    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    A, H, D, Ta, G = 2, 4, 64, 128, 5
    xq = jax.random.normal(k1, (A * G, H, 1, D)) * 0.5
    xk = jax.random.normal(k2, (A, H, D, Ta)) * 0.5
    xv = jax.random.normal(k3, (A, H, D, Ta)) * 0.5

    grouped = _cross_step_attention(xq, xk, xv, H, G)
    tiled = _cross_step_attention(
        xq, jnp.repeat(xk, G, axis=0), jnp.repeat(xv, G, axis=0), H, 1
    )
    np.testing.assert_allclose(
        np.asarray(grouped), np.asarray(tiled), rtol=2e-5, atol=2e-6
    )


def test_kv_int8_decode_runs_and_is_close():
    params = init_params(DIMS, jax.random.PRNGKey(1))
    model = Whisper(DIMS, params)

    mel = (np.random.RandomState(0).randn(80, 3000) * 0.4).astype(np.float32)
    r = model.decode(
        mel, whisper_tpu.DecodingOptions(language="en", temperature=0.0, sample_len=16)
    )
    rq = model.decode(
        mel,
        whisper_tpu.DecodingOptions(
            language="en", temperature=0.0, sample_len=16, kv_cache_dtype="int8"
        ),
    )
    assert isinstance(rq.tokens, list) and len(rq.tokens) > 0
    assert abs(r.avg_logprob - rq.avg_logprob) < 0.2


def test_seed_makes_sampling_reproducible():
    params = init_params(DIMS, jax.random.PRNGKey(2))
    model = Whisper(DIMS, params)
    mel = (np.random.RandomState(1).randn(80, 3000) * 0.4).astype(np.float32)

    def run(seed):
        return model.decode(
            mel,
            whisper_tpu.DecodingOptions(
                language="en", temperature=0.7, sample_len=12, seed=seed
            ),
        ).tokens

    assert run(7) == run(7)
    assert run(7) != run(8)


def test_quantized_decode_runs_and_is_close():
    params = init_params(DIMS, jax.random.PRNGKey(1))
    model = Whisper(DIMS, params)
    model_q = Whisper(DIMS, quantize_params(params))

    mel = (np.random.RandomState(0).randn(80, 3000) * 0.4).astype(np.float32)
    opts = whisper_tpu.DecodingOptions(
        language="en", temperature=0.0, sample_len=16
    )
    r = model.decode(mel, opts)
    rq = model_q.decode(mel, opts)
    assert isinstance(rq.tokens, list) and len(rq.tokens) > 0
    # int8 weight-only should track full precision closely on logprob scale
    assert abs(r.avg_logprob - rq.avg_logprob) < 0.2


def test_int8_logits_projection_close():
    """int8 logits copy: per-vocab-row error stays small vs the f32 matmul."""
    from whisper_tpu.models.whisper import project_logits

    params = init_params(DIMS, jax.random.PRNGKey(3))
    qparams = quantize_params(params, logits=True)
    assert is_quantized(qparams["decoder"]["logits_w"])
    # tok_emb itself is untouched (still used for embedding lookups)
    assert not is_quantized(qparams["decoder"]["tok_emb"])

    hidden = jax.random.normal(jax.random.PRNGKey(4), (3, DIMS.n_text_state))
    full = np.asarray(project_logits(params, hidden))
    q8 = np.asarray(project_logits(qparams, hidden))
    err = np.abs(full - q8).max()
    ref = np.abs(full).max() + 1e-9
    assert err / ref < 0.02, f"relative error {err / ref:.4f}"


def test_int8_logits_decode_runs_and_is_close():
    params = init_params(DIMS, jax.random.PRNGKey(1))
    model = Whisper(DIMS, params)
    model_q = Whisper(DIMS, quantize_params(params, logits=True))

    mel = (np.random.RandomState(0).randn(80, 3000) * 0.4).astype(np.float32)
    opts = whisper_tpu.DecodingOptions(
        language="en", temperature=0.0, sample_len=16
    )
    r = model.decode(mel, opts)
    rq = model_q.decode(mel, opts)
    assert isinstance(rq.tokens, list) and len(rq.tokens) > 0
    assert abs(r.avg_logprob - rq.avg_logprob) < 0.2

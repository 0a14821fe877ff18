from whisper_tpu.evaluation import (
    char_error_rate,
    edit_distance,
    word_error_rate,
)


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], []) == 0
    assert edit_distance(["a", "b"], ["a", "b"]) == 0
    assert edit_distance(["a"], []) == 1


def test_word_error_rate():
    refs = ["the quick brown fox", "hello world"]
    hyps = ["the quick brown fox", "hello there world"]
    # 1 insertion over 6 reference words
    assert abs(word_error_rate(refs, hyps, normalizer=str.lower) - 1 / 6) < 1e-9


def test_wer_with_normalizer():
    # normalizer folds case/punct/numbers so these count as exact
    refs = ["Mr. Smith paid $20 million!"]
    hyps = ["mister smith paid twenty million dollars"]
    assert word_error_rate(refs, hyps) == 0.0


def test_cer():
    assert char_error_rate(["abc"], ["abc"], normalizer=str.lower) == 0.0
    assert char_error_rate(["abcd"], ["abed"], normalizer=str.lower) == 0.25


def test_int8_wer_gate_and_divergence_proxy():
    """The int8 acceptance gate (the criterion validate_real.py executes on
    real checkpoints) and the offline divergence proxy both run end to end
    on random weights.  Identical models must trivially pass the gate and
    show zero divergence; the int8 model must produce finite, sane stats."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_tpu.evaluation import (
        int8_divergence_proxy,
        int8_wer_gate,
        INT8_WER_GATE_MAX_DELTA,
    )
    from whisper_tpu.models.dims import ModelDimensions
    from whisper_tpu.models.whisper import Whisper, init_params
    from whisper_tpu.quantize import quantize_params

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=128, n_audio_head=2,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=128,
        n_text_head=2, n_text_layer=2,
    )
    params = init_params(dims, jax.random.PRNGKey(0), jnp.float32)
    model = Whisper(dims, params)
    qmodel = Whisper(dims, quantize_params(params))

    rng = np.random.RandomState(0)
    items = [(rng.randn(16000 * 2).astype(np.float32) * 0.1, "hello world")
             for _ in range(3)]

    # identical models: zero delta, trivially passes
    same = int8_wer_gate(model, model, items, batch_size=2, sample_len=4)
    assert same["delta"] == 0.0 and same["passed"]
    assert 0 < INT8_WER_GATE_MAX_DELTA < 0.01  # stated, sane threshold

    # int8 vs bf16: the gate runs and reports both corpus WERs
    gate = int8_wer_gate(model, qmodel, items, batch_size=2, sample_len=4)
    assert set(gate) >= {"bf16_wer", "int8_wer", "delta", "passed"}
    assert np.isfinite(gate["delta"])

    mels = rng.randn(2, 80, 3000).astype(np.float32) * 0.3
    prox_same = int8_divergence_proxy(model, model, mels, sample_len=4)
    assert prox_same["token_agreement"] == 1.0
    assert prox_same["logit_absdiff_max"] == 0.0
    assert prox_same["top1_match"] == 1.0

    prox = int8_divergence_proxy(model, qmodel, mels, sample_len=4)
    assert 0.0 <= prox["token_agreement"] <= 1.0
    assert prox["logit_absdiff_max"] > 0.0  # quantization is not a no-op
    assert np.isfinite(prox["logit_absdiff_mean"])
    assert prox["n_windows"] == 2

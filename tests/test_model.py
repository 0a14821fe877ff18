import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.models import ModelDimensions, Whisper
from whisper_tpu.models.whisper import (
    compute_cross_kv,
    decoder_forward,
    decoder_prefill,
    decoder_step,
    encoder_apply,
    init_kv_cache,
    init_params,
    project_logits,
)

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=64,
    n_text_head=2, n_text_layer=2,
)


def test_incremental_matches_full_forward():
    """The KV-cached step decode must reproduce the teacher-forced forward."""
    import jax

    params = init_params(DIMS, jax.random.PRNGKey(0))
    mel = np.random.RandomState(0).randn(1, 80, 3000).astype(np.float32)
    feats = encoder_apply(params, DIMS, jnp.asarray(mel))
    tokens = jnp.asarray([[50258, 50259, 50359, 50363, 440, 7177, 300]], jnp.int32)

    full_logits, _ = decoder_forward(params, DIMS, tokens, feats)

    xk, xv = compute_cross_kv(params, DIMS, feats)
    cache = init_kv_cache(DIMS, 1, xk, xv, jnp.float32)
    P = 4
    hid, pk, pv = decoder_prefill(params, DIMS, tokens[:, :P], xk, xv)
    cache = cache._replace(
        self_k=cache.self_k.at[:, :, :, :, :P].set(pk.swapaxes(-1, -2)),
        self_v=cache.self_v.at[:, :, :, :, :P].set(pv.swapaxes(-1, -2)),
    )
    lg = project_logits(params, hid)
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(full_logits[:, :P]), atol=2e-4
    )
    for t in range(P, tokens.shape[1]):
        h, cache = decoder_step(params, DIMS, tokens[:, t], jnp.int32(t), cache)
        lt = project_logits(params, h)
        np.testing.assert_allclose(
            np.asarray(lt[0]), np.asarray(full_logits[0, t]), atol=2e-4
        )


@pytest.mark.reference
def test_activation_parity():
    from _reference import TINY_DIMS, convert_to_jax, make_reference_model

    import torch

    ref_model = make_reference_model(TINY_DIMS)
    params, dims = convert_to_jax(ref_model)

    mel = np.random.RandomState(1).randn(1, 80, 3000).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_model.encoder(torch.from_numpy(mel)).numpy()
    feats = np.asarray(encoder_apply(params, dims, jnp.asarray(mel)))
    assert np.abs(ref_feats - feats).max() < 5e-4

    tokens = np.array([[50258, 50259, 50359, 50363, 440, 7177]], dtype=np.int64)
    with torch.no_grad():
        ref_logits = ref_model.decoder(
            torch.from_numpy(tokens), torch.from_numpy(ref_feats)
        ).numpy()
    logits, _ = decoder_forward(
        params, dims, jnp.asarray(tokens, jnp.int32), jnp.asarray(feats)
    )
    assert np.abs(ref_logits - np.asarray(logits)).max() < 5e-4
    assert (ref_logits.argmax(-1) == np.asarray(logits).argmax(-1)).all()


def test_whisper_wrapper_properties():
    model = Whisper(DIMS)
    assert model.is_multilingual
    assert model.num_languages == 99
    assert model.num_parameters() > 0
    turbo_like = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=51866, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    assert Whisper(turbo_like).num_languages == 100
    en_only = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=51864, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    assert not Whisper(en_only).is_multilingual

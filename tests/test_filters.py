"""Property tests: vectorized logit filters vs the reference implementations.

The engine re-derives SuppressBlank / SuppressTokens / ApplyTimestampRules as
pure masks (engine.apply_logit_filters); these tests drive both versions with
random logits and token histories and require identical outputs (up to the
-inf representation).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_tpu.engine import EngineSpec, FilterArgs, apply_logit_filters
from whisper_tpu.tokenizer import get_tokenizer

pytestmark = pytest.mark.reference


@pytest.fixture(scope="module")
def setup():
    import torch

    from _reference import import_reference

    ref_whisper = import_reference()
    from whisper.decoding import ApplyTimestampRules, SuppressBlank, SuppressTokens

    tokenizer = get_tokenizer(True, language="en", task="transcribe")
    ref_tok = ref_whisper.tokenizer.get_tokenizer(
        True, language="en", task="transcribe"
    )
    return torch, (SuppressBlank, SuppressTokens, ApplyTimestampRules), tokenizer, ref_tok


def _spec(tokenizer, n_vocab=51865, use_ts=True):
    return EngineSpec(
        beam_size=0, n_group=1, max_candidates=0, prefill_len=8,
        argmax=True, use_ts_rules=use_ts,
        eot=tokenizer.eot, sot=tokenizer.sot, no_speech=tokenizer.no_speech,
        no_timestamps=tokenizer.no_timestamps,
        timestamp_begin=tokenizer.timestamp_begin,
    )


def _filter_args(tokenizer, n_vocab, sample_begin, suppress=True, max_init=50):
    suppress_mask = np.zeros(n_vocab, bool)
    if suppress:
        ids = list(tokenizer.non_speech_tokens) + [
            tokenizer.transcribe, tokenizer.translate, tokenizer.sot,
            tokenizer.sot_prev, tokenizer.sot_lm, tokenizer.no_speech,
        ]
        suppress_mask[sorted(set(ids))] = True
    blank_mask = np.zeros(n_vocab, bool)
    blank_mask[tokenizer.encode(" ") + [tokenizer.eot]] = True
    return FilterArgs(
        suppress_mask=jnp.asarray(suppress_mask),
        blank_mask=jnp.asarray(blank_mask),
        sample_begin=jnp.int32(sample_begin),
        max_initial_ts_index=jnp.int32(max_init),
    )


def _reference_filters(setup, sample_begin, max_init):
    torch, (SuppressBlank, SuppressTokens, ApplyTimestampRules), tok, ref_tok = setup
    ids = sorted(
        set(
            list(ref_tok.non_speech_tokens)
            + [ref_tok.transcribe, ref_tok.translate, ref_tok.sot,
               ref_tok.sot_prev, ref_tok.sot_lm, ref_tok.no_speech]
        )
    )
    return [
        SuppressBlank(ref_tok, sample_begin),
        SuppressTokens(ids),
        ApplyTimestampRules(ref_tok, sample_begin, max_init),
    ]


@pytest.mark.parametrize("case", range(6))
def test_filters_match_reference(setup, case):
    torch = setup[0]
    tokenizer = setup[2]
    n_vocab = 51865
    rng = np.random.RandomState(case)
    sample_begin = 4
    ts = tokenizer.timestamp_begin

    # craft token histories covering the timestamp-rule branches
    histories = {
        0: [50258, 50259, 50359, 50363],  # at sample start
        1: [50258, 50259, 50359, 50363, ts + 3],  # lone timestamp
        2: [50258, 50259, 50359, 50363, ts + 3, 440],  # ts then text
        3: [50258, 50259, 50359, 50363, ts + 3, 440, ts + 9],  # closing ts
        4: [50258, 50259, 50359, 50363, ts + 3, ts + 3, 440, 318],  # pair
        5: [50258, 50259, 50359, 50363, 440, 318, 262],  # text only
    }
    seq = histories[case]
    B = 3
    logits = rng.randn(B, n_vocab).astype(np.float32) * 3

    # ours: fixed-size buffer + dynamic t
    spec = _spec(tokenizer)
    fa = _filter_args(tokenizer, n_vocab, sample_begin)
    buf = np.zeros((B, 449), np.int32)
    buf[:, : len(seq)] = seq
    ours = np.asarray(
        apply_logit_filters(
            spec, jnp.asarray(logits), jnp.asarray(buf), jnp.int32(len(seq)), fa
        )
    )

    ref_logits = torch.from_numpy(logits.copy())
    ref_tokens = torch.tensor([seq] * B)
    for f in _reference_filters(setup, sample_begin, 50):
        f.apply(ref_logits, ref_tokens)
    ref = ref_logits.numpy()

    ours_masked = ~np.isfinite(np.where(ours <= np.finfo(np.float32).min / 2, -np.inf, ours))
    ref_masked = ~np.isfinite(ref)
    np.testing.assert_array_equal(ours_masked, ref_masked, err_msg=f"case {case}")
    np.testing.assert_allclose(
        np.where(ours_masked, 0, ours), np.where(ref_masked, 0, ref), atol=1e-5
    )

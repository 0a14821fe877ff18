"""Draft-decoder distillation (whisper_tpu.distill).

No reference analog (openai/whisper ships no training code).  Asserts the
full loop: distil-whisper-style init from teacher layers, KL descent on
the teacher's own greedy pseudo-labels, a measurable acceptance gain for
the speculative engine, and (by construction) token-exact decoding when
the distilled draft is plugged into decode(draft_model=...).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import whisper_tpu
from whisper_tpu.decoding import DecodingOptions
from whisper_tpu.distill import (
    DistillState,
    distill,
    distill_loss,
    distill_step,
    init_draft_from_teacher,
    make_draft_dims,
    offline_acceptance,
)
from whisper_tpu.models.dims import ModelDimensions
from whisper_tpu.models.whisper import Whisper, init_params
from whisper_tpu.tokenizer import get_tokenizer
from whisper_tpu.training import make_optimizer

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=64,
    n_text_head=4, n_text_layer=3,
)


@pytest.fixture(scope="module")
def teacher():
    return Whisper(DIMS, init_params(DIMS, jax.random.PRNGKey(0)))


@pytest.fixture(scope="module")
def mels():
    rng = np.random.RandomState(5)
    return jnp.asarray(rng.randn(4, 80, 3000) * 0.4, jnp.float32)


@pytest.fixture(scope="module")
def pseudo_batch(teacher, mels):
    """Teacher greedy transcripts as a teacher-forced distillation batch."""
    opts = DecodingOptions(
        language="en", temperature=0.0, sample_len=16, without_timestamps=True
    )
    results = whisper_tpu.decode(teacher, mels, opts)
    tok = get_tokenizer(multilingual=True, language="en", task="transcribe")
    prefix = list(tok.sot_sequence_including_notimestamps)
    seqs = [prefix + list(r.tokens) + [tok.eot] for r in results]
    S = max(len(s) for s in seqs)
    tokens = np.full((len(seqs), S), tok.eot, np.int32)
    mask = np.zeros((len(seqs), S), np.float32)
    for i, s in enumerate(seqs):
        tokens[i, : len(s)] = s
        mask[i, len(prefix): len(s)] = 1.0  # predict text tokens + EOT
    features = teacher.embed_audio(mels)
    return {
        "features": features,
        "tokens": jnp.asarray(tokens),
        "loss_mask": jnp.asarray(mask),
    }


def test_draft_dims_and_init(teacher):
    draft_params, draft_dims = init_draft_from_teacher(
        teacher.params, DIMS, n_text_layer=2
    )
    assert draft_dims == dataclasses.replace(DIMS, n_text_layer=2)
    # maximally spaced init: first and last teacher layers
    teach_blocks = teacher.params["decoder"]["blocks"]
    leaf = next(iter(jax.tree_util.tree_leaves(teach_blocks)))
    draft_leaf = next(
        iter(jax.tree_util.tree_leaves(draft_params["decoder"]["blocks"]))
    )
    assert draft_leaf.shape[0] == 2
    np.testing.assert_array_equal(draft_leaf[0], leaf[0])
    np.testing.assert_array_equal(draft_leaf[1], leaf[DIMS.n_text_layer - 1])
    # embeddings / final LN are the teacher's
    np.testing.assert_array_equal(
        draft_params["decoder"]["tok_emb"], teacher.params["decoder"]["tok_emb"]
    )
    with pytest.raises(ValueError):
        make_draft_dims(DIMS, 0)
    with pytest.raises(ValueError):
        make_draft_dims(DIMS, DIMS.n_text_layer + 1)


def test_self_distillation_loss_is_zero(teacher, pseudo_batch):
    """KL(teacher ‖ teacher) == 0: the loss is a true divergence."""
    loss = distill_loss(
        teacher.params["decoder"], teacher.params, DIMS, DIMS, pseudo_batch
    )
    assert abs(float(loss)) < 1e-3


def test_distill_loss_descends_and_acceptance_improves(teacher, pseudo_batch):
    draft_params, draft_dims = init_draft_from_teacher(
        teacher.params, DIMS, n_text_layer=1
    )
    optimizer = make_optimizer(learning_rate=1e-3)
    state = DistillState(
        draft_params["decoder"],
        optimizer.init(draft_params["decoder"]),
        jnp.int32(0),
    )
    init_draft = Whisper(
        draft_dims,
        {"encoder": teacher.params["encoder"], "decoder": state.decoder},
    )
    acc_init = offline_acceptance(
        init_draft, pseudo_batch["tokens"], pseudo_batch["features"],
        pseudo_batch["loss_mask"],
    )

    losses = []
    for _ in range(120):
        state, metrics = distill_step(
            state, teacher.params, draft_dims, DIMS, optimizer, pseudo_batch
        )
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 120
    assert min(losses[-10:]) < 0.5 * losses[0], (losses[0], losses[-1])

    trained = Whisper(
        draft_dims,
        {"encoder": teacher.params["encoder"], "decoder": state.decoder},
    )
    acc_trained = offline_acceptance(
        trained, pseudo_batch["tokens"], pseudo_batch["features"],
        pseudo_batch["loss_mask"],
    )
    # the only thing a draft buys is acceptance — it must move
    assert acc_trained > acc_init, (acc_init, acc_trained)
    assert acc_trained > 0.5, acc_trained


def test_distill_end_to_end_decode_exact(teacher, mels, pseudo_batch):
    """distill() returns a Whisper that plugs into decode(draft_model=...)
    with token-exact output (shared-encoder speculative path)."""
    draft = distill(
        teacher,
        (pseudo_batch for _ in range(60)),
        n_text_layer=1,
        learning_rate=1e-3,
    )
    assert draft.dims.n_text_layer == 1

    opts = DecodingOptions(
        language="en", temperature=0.0, sample_len=16, without_timestamps=True
    )
    plain = whisper_tpu.decode(teacher, mels, opts)
    spec = whisper_tpu.decode(teacher, mels, opts, draft_model=draft)
    for p, s in zip(plain, spec):
        assert p.tokens == s.tokens
        assert abs(p.avg_logprob - s.avg_logprob) < 1e-4


def test_distill_accepts_mel_batches(teacher, mels, pseudo_batch):
    """Batches may carry raw mel; the shared frozen encoder runs inside."""
    batch = {
        "mel": mels,
        "tokens": pseudo_batch["tokens"],
        "loss_mask": pseudo_batch["loss_mask"],
    }
    draft = distill(teacher, [batch], n_text_layer=2)
    assert draft.dims.n_text_layer == 2

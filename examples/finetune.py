"""Fine-tuning skeleton: DP+TP sharded training on a TPU mesh.

The reference is inference-only; this example shows the whisper_tpu training
extension: load a checkpoint, shard it over a ("data", "model") mesh, and run
teacher-forced cross-entropy steps.  Batches are (mel, tokens, loss_mask)
where tokens are [sot_seq..., text..., eot] padded to a fixed length and the
loss mask covers the text+eot region.
"""

import numpy as np

import jax
import jax.numpy as jnp

import whisper_tpu
from whisper_tpu.parallel import make_mesh, shard_params
from whisper_tpu.tokenizer import get_tokenizer
from whisper_tpu.training import init_train_state, make_optimizer, train_step


def make_batch(model, tokenizer, waveforms, texts, max_tokens=64):
    mels = np.stack(
        [
            whisper_tpu.pad_or_trim(
                np.asarray(whisper_tpu.log_mel_spectrogram(w, model.dims.n_mels)),
                whisper_tpu.audio.N_FRAMES,
            )
            for w in waveforms
        ]
    )
    tokens = np.zeros((len(texts), max_tokens), np.int32)
    mask = np.zeros((len(texts), max_tokens), np.float32)
    for i, text in enumerate(texts):
        ids = [*tokenizer.sot_sequence_including_notimestamps,
               *tokenizer.encode(" " + text.strip()), tokenizer.eot]
        ids = ids[:max_tokens]
        tokens[i, : len(ids)] = ids
        mask[i, len(tokenizer.sot_sequence) : len(ids)] = 1.0
    return {"mel": jnp.asarray(mels), "tokens": jnp.asarray(tokens),
            "loss_mask": jnp.asarray(mask)}


def main():
    model = whisper_tpu.load_model("tiny")
    tokenizer = get_tokenizer(model.is_multilingual, language="en", task="transcribe")

    n = len(jax.devices())
    mesh = make_mesh((max(n // 2, 1), 2 if n % 2 == 0 else 1))
    optimizer = make_optimizer(learning_rate=1e-5)

    with mesh:
        params = shard_params(model.params, mesh)
        state = init_train_state(params, optimizer)

        # toy data: silence -> empty-ish transcripts; substitute a real corpus
        rng = np.random.RandomState(0)
        for step in range(3):
            waveforms = [rng.randn(16000 * 3).astype(np.float32) * 0.01] * 4
            texts = ["hello world"] * 4
            batch = make_batch(model, tokenizer, waveforms, texts)
            state, metrics = train_step(state, model.dims, optimizer, batch)
            print(f"step {int(metrics['step'])}: loss {float(metrics['loss']):.4f}")


if __name__ == "__main__":
    main()

import sys, os, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from whisper_tpu.models.dims import KNOWN_MODELS
from whisper_tpu.models.whisper import Whisper, init_params
from whisper_tpu.audio import log_mel_spectrogram, N_SAMPLES
from whisper_tpu import batch as batch_mod
from whisper_tpu.decoding import DecodingTask

dims = KNOWN_MODELS["large-v3"]
params = init_params(dims, jax.random.PRNGKey(0), jnp.bfloat16)
model = Whisper(dims, params, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
audios = [(rng.randn(16000 * 30) * 0.1).astype(np.float32) for _ in range(16)]

kw = dict(batch_size=16, language="en", temperature=0.0, sample_len=110,
          condition_on_previous_text=False, compression_ratio_threshold=None,
          logprob_threshold=None, no_speech_threshold=None)

# instrument rounds
orig = DecodingTask.run_with_prompts
calls = []
def wrapped(self, mel, prompts):
    t0 = time.perf_counter()
    r = orig(self, mel, prompts)
    calls.append(time.perf_counter() - t0)
    return r
DecodingTask.run_with_prompts = wrapped

batch_mod.transcribe_batch(model, audios, **kw)  # warmup
calls.clear()

t0 = time.perf_counter()
t_mel0 = time.perf_counter()
mels = [np.asarray(log_mel_spectrogram(a, dims.n_mels, padding=N_SAMPLES)) for a in audios]
t_mel = time.perf_counter() - t_mel0
print(f"mel for 16 files: {t_mel*1e3:.0f} ms")

calls.clear()
t0 = time.perf_counter()
batch_mod.transcribe_batch(model, audios, **kw)
total = time.perf_counter() - t0
print(f"transcribe_batch total: {total*1e3:.0f} ms, engine rounds: {len(calls)}, "
      f"engine time: {sum(calls)*1e3:.0f} ms, per-round: "
      f"{[round(c*1e3) for c in calls]}")

"""Device-side rejection sampling (reference:
vllm/v1/sample/rejection_sampler.py): with one-hot draft dist q,
emitting draft-on-accept / recovery-on-reject must reproduce the
target distribution exactly. Verified empirically at the sampler
level, plus engine-level spec decoding with temperature > 0."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vllm_main_modify_tpu.sample.metadata import \
    SamplingMetadata  # noqa: E402
from vllm_main_modify_tpu.sample.sampler import sample  # noqa: E402


def test_rejection_preserves_target_distribution():
    vocab = 8
    rng = np.random.default_rng(0)
    logits_row = rng.standard_normal(vocab).astype(np.float32) * 1.5
    target_p = np.exp(logits_row) / np.exp(logits_row).sum()
    draft = int(np.argsort(target_p)[-2])  # a plausible draft token

    n = 4000
    logits = jnp.asarray(np.tile(logits_row, (n, 1)))
    meta = SamplingMetadata(
        temperature=jnp.full((n, ), 1.0),
        top_k=jnp.zeros((n, ), jnp.int32),
        top_p=jnp.ones((n, )),
        min_p=jnp.zeros((n, )),
        seeds=jnp.arange(n, dtype=jnp.uint32),  # iid rows
        sample_pos=jnp.zeros((n, ), jnp.int32),
        all_greedy=False,
        draft_token_ids=jnp.full((n, ), draft, jnp.int32),
        need_rejection=True,
    )
    out = sample(logits, meta, jax.random.PRNGKey(7))
    accept = np.asarray(out.spec_accept)
    recovery = np.asarray(out.sampled)
    emitted = np.where(accept, draft, recovery)

    counts = np.bincount(emitted, minlength=vocab) / n
    # each bin is a binomial proportion; 4 sigma tolerance
    tol = 4 * np.sqrt(target_p * (1 - target_p) / n) + 1e-3
    assert np.all(np.abs(counts - target_p) < tol), (
        counts, target_p, tol)
    # acceptance rate must be p[draft] (one-hot q)
    assert abs(accept.mean() - target_p[draft]) < 4 * np.sqrt(
        target_p[draft] / n)
    # recovery samples never equal the draft
    assert not np.any(recovery[~accept] == draft)


def test_spec_decode_random_sampling_e2e(tiny_llama_dir):
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    llm = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=256,
              speculative_config={"method": "ngram",
                                  "num_speculative_tokens": 3,
                                  "prompt_lookup_min": 1,
                                  "prompt_lookup_max": 3})
    # low (but nonzero) temperature: the random-weights model then
    # repeats itself, so trailing n-grams actually match — at high
    # temperature every sampled token is novel and no drafts form
    sp = SamplingParams(temperature=0.05, seed=42, max_tokens=24,
                        ignore_eos=True)
    out = llm.generate(["hello world hello world hello world"], sp)[0]
    assert len(out.outputs[0].token_ids) == 24
    sched = llm.engine.engine_core.scheduler
    assert sched.spec_num_draft_tokens_total > 0
    # seeded spec sampling reproduces itself
    out2 = llm.generate(["hello world hello world hello world"], sp)[0]
    assert out2.outputs[0].token_ids == out.outputs[0].token_ids

"""Prompt-embeds request input (reference: EmbedsPrompt,
vllm/inputs/data.py + --enable-prompt-embeds): feeding the embedding
rows of a token prompt reproduces the token-path generation exactly;
the embeds content is hashed into the cache salt so prefix caching
never aliases different embeddings; the flag gates the input."""

import numpy as np
import pytest

from vllm_main_modify_tpu.entrypoints.llm import LLM
from vllm_main_modify_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def embeds_llm(tiny_llama_dir):
    return LLM(model=tiny_llama_dir, dtype="float32",
               max_model_len=128, max_num_seqs=4,
               max_num_batched_tokens=64, block_size=4,
               num_kv_blocks=256, enable_prompt_embeds=True)


def _embed_rows(tiny_llama_dir, token_ids):
    from safetensors.numpy import load_file

    import glob
    sd = {}
    for f in glob.glob(tiny_llama_dir + "/*.safetensors"):
        sd.update(load_file(f))
    emb = sd["model.embed_tokens.weight"]
    return np.asarray(emb[np.asarray(token_ids)], np.float32)


def test_embeds_match_token_path(embeds_llm, tiny_llama_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=12,
                        ignore_eos=True)
    prompt = [5, 9, 42, 7, 101, 33, 8]
    ref = embeds_llm.generate([{"prompt_token_ids": prompt}], sp)[0]
    rows = _embed_rows(tiny_llama_dir, prompt)
    got = embeds_llm.generate([{"prompt_embeds": rows}], sp)[0]
    assert list(got.outputs[0].token_ids) == \
        list(ref.outputs[0].token_ids)


def test_embeds_batched_with_tokens(embeds_llm, tiny_llama_dir):
    sp = SamplingParams(temperature=0.0, max_tokens=6,
                        ignore_eos=True)
    p1 = [5, 9, 42]
    p2 = [7, 101, 33, 8]
    rows1 = _embed_rows(tiny_llama_dir, p1)
    outs = embeds_llm.generate(
        [{"prompt_embeds": rows1}, {"prompt_token_ids": p2}], sp)
    refs = embeds_llm.generate(
        [{"prompt_token_ids": p1}, {"prompt_token_ids": p2}], sp)
    for got, ref in zip(outs, refs):
        assert list(got.outputs[0].token_ids) == \
            list(ref.outputs[0].token_ids)


def test_embeds_gated_and_validated(tiny_llama_dir, embeds_llm):
    sp = SamplingParams(temperature=0.0, max_tokens=2)
    off = LLM(model=tiny_llama_dir, dtype="float32", max_model_len=64,
              max_num_seqs=2, max_num_batched_tokens=32, block_size=4,
              num_kv_blocks=64)
    with pytest.raises(ValueError, match="enable_prompt_embeds"):
        off.generate(
            [{"prompt_embeds": np.zeros((3, 64), np.float32)}], sp)
    with pytest.raises(ValueError, match="hidden_size"):
        embeds_llm.generate(
            [{"prompt_embeds": np.zeros((3, 7), np.float32)}], sp)

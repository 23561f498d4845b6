"""Benchmark dataset samplers.

Reference: vllm/benchmarks/datasets.py (RandomDataset, ShareGPT,
sonnet, RandomMultiModalDataset) — without these, throughput numbers
are not comparable to published ``vllm bench`` runs, which sample
real-length request distributions instead of fixed synthetic shapes.

Implemented TPU-side with the same sampling semantics:

- ``RandomDataset``: token ids uniform over the vocab, input/output
  lengths sampled from ``[len*(1-range_ratio), len*(1+range_ratio)]``.
- ``ShareGPTDataset``: the standard ShareGPT JSON export — first
  human turn is the prompt, the assistant turn's length is the output
  budget; entries outside the length filters are skipped (reference
  ``is_valid_sequence``: 4 <= len, prompt < 1024, prompt+out < 2048).
- ``SonnetDataset``: line-built prompts of ~input_len tokens from a
  text file (the reference's poetry prefix sampler).
- ``RandomMultiModalDataset``: random prompts + synthetic images at
  fixed buckets.

All samplers return :class:`SampleRequest` (prompt text OR token ids,
expected output length, optional multimodal data) so both the offline
LLM benchmarks and the HTTP serve benchmark consume them directly.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np


@dataclass
class SampleRequest:
    """One benchmark request (reference: datasets.py:72)."""

    prompt: Any  # str or list[int] token ids
    prompt_len: int
    expected_output_len: int
    multi_modal_data: Optional[dict] = field(default=None)


def is_valid_sequence(prompt_len: int, output_len: int,
                      min_len: int = 4, max_prompt_len: int = 1024,
                      max_total_len: int = 2048) -> bool:
    """Reference: datasets.py:254 — the ShareGPT length filter."""
    return (prompt_len >= min_len and output_len >= min_len
            and prompt_len < max_prompt_len
            and prompt_len + output_len < max_total_len)


class RandomDataset:
    """Uniform random token ids with length jitter (reference:
    RandomDataset.sample)."""

    def __init__(self, seed: int = 0, input_len: int = 1024,
                 output_len: int = 128, range_ratio: float = 0.0,
                 vocab_size: int = 32000,
                 prefix_len: int = 0) -> None:
        self.rng = np.random.default_rng(seed)
        self.input_len = input_len
        self.output_len = output_len
        self.range_ratio = range_ratio
        self.vocab_size = vocab_size
        self.prefix = (self.rng.integers(
            1, vocab_size - 1, size=prefix_len).tolist()
            if prefix_len else [])

    def sample(self, num_requests: int) -> list[SampleRequest]:
        r = self.range_ratio
        lo_in = max(int(self.input_len * (1 - r)), 1)
        hi_in = int(self.input_len * (1 + r))
        lo_out = max(int(self.output_len * (1 - r)), 1)
        hi_out = int(self.output_len * (1 + r))
        out = []
        for _ in range(num_requests):
            ilen = int(self.rng.integers(lo_in, hi_in + 1))
            olen = int(self.rng.integers(lo_out, hi_out + 1))
            ids = self.prefix + self.rng.integers(
                1, self.vocab_size - 1, size=ilen).tolist()
            out.append(SampleRequest(ids, len(ids), olen))
        return out


class ShareGPTDataset:
    """ShareGPT-format JSON conversations (reference:
    ShareGPTDataset.sample). ``tokenize`` maps text to a length — pass
    the tokenizer's encode or a callable; entries failing the
    reference length filter are skipped, and the list is oversampled
    by cycling when too short."""

    def __init__(self, path: str, tokenize, seed: int = 0) -> None:
        with open(path) as f:
            data = json.load(f)
        self.entries = [
            d["conversations"] for d in data
            if len(d.get("conversations", [])) >= 2
        ]
        self.tokenize = tokenize
        self.rnd = random.Random(seed)
        self.rnd.shuffle(self.entries)

    def sample(self, num_requests: int) -> list[SampleRequest]:
        out: list[SampleRequest] = []
        i = 0
        while len(out) < num_requests and i < len(self.entries) * 4:
            conv = self.entries[i % len(self.entries)]
            i += 1
            prompt = conv[0]["value"]
            completion = conv[1]["value"]
            p_ids = self.tokenize(prompt)
            o_len = len(self.tokenize(completion))
            if not is_valid_sequence(len(p_ids), o_len):
                continue
            out.append(SampleRequest(prompt, len(p_ids), o_len))
        if not out:
            raise ValueError("no ShareGPT entries pass the filters")
        while len(out) < num_requests:  # oversample by cycling
            out.append(out[len(out) % max(len(out), 1)])
        return out


class SonnetDataset:
    """Poetry-line prompt builder (reference: SonnetDataset) — joins
    consecutive lines until ~input_len tokens."""

    def __init__(self, path: str, tokenize, seed: int = 0,
                 input_len: int = 550,
                 output_len: int = 150) -> None:
        with open(path) as f:
            self.lines = [ln for ln in f.read().splitlines()
                          if ln.strip()]
        self.tokenize = tokenize
        self.rnd = random.Random(seed)
        self.input_len = input_len
        self.output_len = output_len

    def sample(self, num_requests: int) -> list[SampleRequest]:
        out = []
        for _ in range(num_requests):
            start = self.rnd.randrange(len(self.lines))
            text = ""
            k = start
            while len(self.tokenize(text)) < self.input_len:
                text += self.lines[k % len(self.lines)] + "\n"
                k += 1
                if k - start > 10_000:
                    break
            out.append(SampleRequest(text, len(self.tokenize(text)),
                                     self.output_len))
        return out


class RandomMultiModalDataset(RandomDataset):
    """Random prompts + synthetic images (reference:
    RandomMultiModalDataset): each request carries ``images_per_req``
    random CHW float images at ``image_size``."""

    def __init__(self, image_size: int = 336,
                 images_per_req: int = 1, **kw) -> None:
        super().__init__(**kw)
        self.image_size = image_size
        self.images_per_req = images_per_req

    def sample(self, num_requests: int) -> list[SampleRequest]:
        reqs = super().sample(num_requests)
        s = self.image_size
        for r in reqs:
            imgs = [
                self.rng.standard_normal((3, s, s)).astype(np.float32)
                for _ in range(self.images_per_req)
            ]
            r.multi_modal_data = {
                "image": imgs if len(imgs) > 1 else imgs[0]
            }
        return reqs


def build_dataset(name: str, **kw):
    """CLI entry: ``--dataset-name {random,sharegpt,sonnet,
    random-mm}`` (reference: vllm bench --dataset-name)."""
    table = {
        "random": RandomDataset,
        "sharegpt": ShareGPTDataset,
        "sonnet": SonnetDataset,
        "random-mm": RandomMultiModalDataset,
    }
    if name not in table:
        raise ValueError(
            f"unknown dataset {name!r}; known: {sorted(table)}")
    return table[name](**kw)

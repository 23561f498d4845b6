"""GSM8K accuracy gate (reference: tests/evals/gsm8k/
test_gsm8k_correctness.py + gsm8k_eval.py — an lm-eval replacement).

Skipped unless real weights + the dataset are present (no network
egress in CI). Run the moment they are:

    VLLM_TPU_EVAL_MODEL=/path/to/Qwen2.5-1.5B-Instruct \\
    VLLM_TPU_GSM8K_PATH=/path/to/gsm8k_test.jsonl \\
    VLLM_TPU_GSM8K_THRESHOLD=0.55 \\
    pytest tests/evals/test_gsm8k.py -s

The dataset file is the standard GSM8K test split as JSONL with
{"question": ..., "answer": "...#### <number>"} rows.
"""

import json
import os
import re

import pytest

MODEL = os.environ.get("VLLM_TPU_EVAL_MODEL")
DATA = os.environ.get("VLLM_TPU_GSM8K_PATH")
THRESHOLD = float(os.environ.get("VLLM_TPU_GSM8K_THRESHOLD", "0.55"))
NUM_QUESTIONS = int(os.environ.get("VLLM_TPU_GSM8K_N", "200"))
NUM_SHOTS = int(os.environ.get("VLLM_TPU_GSM8K_SHOTS", "5"))

ANS_RE = re.compile(r"(-?[\d,]+(?:\.\d+)?)")


def extract_answer(text: str):
    """Last number in the text (gsm8k_eval.py convention)."""
    matches = ANS_RE.findall(text.replace(",", ""))
    if not matches:
        return None
    try:
        return float(matches[-1])
    except ValueError:
        return None


def gold_answer(answer_field: str) -> float:
    return float(answer_field.split("####")[-1].strip()
                 .replace(",", ""))


@pytest.mark.skipif(
    not (MODEL and DATA and os.path.isdir(MODEL or "")
         and os.path.isfile(DATA or "")),
    reason="set VLLM_TPU_EVAL_MODEL and VLLM_TPU_GSM8K_PATH to run "
           "the accuracy gate (needs real weights + dataset)")
def test_gsm8k_accuracy():
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    rows = []
    with open(DATA) as f:
        for line in f:
            rows.append(json.loads(line))
    assert len(rows) > NUM_QUESTIONS + NUM_SHOTS
    shots = rows[:NUM_SHOTS]
    questions = rows[NUM_SHOTS:NUM_SHOTS + NUM_QUESTIONS]

    prefix = "".join(
        f"Question: {r['question']}\nAnswer: {r['answer']}\n\n"
        for r in shots)
    prompts = [
        prefix + f"Question: {r['question']}\nAnswer:"
        for r in questions
    ]
    llm = LLM(model=MODEL, max_model_len=4096, max_num_seqs=32,
              max_num_batched_tokens=8192)
    outs = llm.generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=256,
                       stop=["Question:", "\n\n"]))
    correct = 0
    for r, out in zip(questions, outs):
        got = extract_answer(out.outputs[0].text)
        if got is not None and abs(got - gold_answer(r["answer"])) \
                < 1e-4:
            correct += 1
    accuracy = correct / len(questions)
    print(f"GSM8K accuracy: {accuracy:.3f} "
          f"({correct}/{len(questions)}), threshold {THRESHOLD}")
    assert accuracy >= THRESHOLD, (
        f"accuracy {accuracy:.3f} below gate {THRESHOLD}")


def test_answer_extraction():
    """The harness itself is always tested."""
    assert extract_answer("the answer is 42.") == 42
    assert extract_answer("12 + 30 = 42") == 42
    assert extract_answer("costs $1,234.50 total") == 1234.5
    assert extract_answer("no numbers here") is None
    assert gold_answer("blah blah\n#### 1,250") == 1250.0

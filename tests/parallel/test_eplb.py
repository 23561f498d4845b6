"""EPLB rebalance algorithm + weight movement (reference:
vllm/distributed/eplb/ — DeepSeek EPLB semantics)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.parallel.eplb import (EplbState,
                                                balanced_packing,
                                                rebalance_experts,
                                                replicate_experts,
                                                translate_experts)


def test_balanced_packing_properties():
    rng = np.random.default_rng(0)
    w = rng.integers(1, 100, size=(3, 8)).astype(np.float64)
    pack, rank = balanced_packing(w, 4)
    for i in range(3):
        # exactly 2 items per pack, ranks 0..1
        for p in range(4):
            items = np.flatnonzero(pack[i] == p)
            assert len(items) == 2
            assert sorted(rank[i, items]) == [0, 1]
        # greedy balance: max pack <= total (sanity) and better than
        # worst-case contiguous split
        packw = [w[i, pack[i] == p].sum() for p in range(4)]
        assert max(packw) <= w[i].sum()


def test_replicate_experts_minimizes_max_load():
    w = np.array([[100.0, 10, 10, 10]])
    phy2log, rank, logcnt = replicate_experts(w, 7)
    # all 3 redundant slots go to the hot expert
    assert logcnt[0, 0] == 4
    assert (phy2log[0] == 0).sum() == 4
    # per-replica load of the hot expert now matches the others
    assert w[0, 0] / logcnt[0, 0] == 25.0


def test_rebalance_experts_mapping_consistency():
    rng = np.random.default_rng(1)
    L, E, P = 2, 8, 12
    load = rng.integers(1, 1000, size=(L, E)).astype(np.float64)
    phy2log, log2phy, logcnt = rebalance_experts(
        load, P, num_groups=4, num_nodes=2, num_devices=4)
    assert phy2log.shape == (L, P)
    assert logcnt.sum(-1).tolist() == [P, P]
    for i in range(L):
        # every logical expert has >= 1 replica; log2phy inverts
        for e in range(E):
            phys = [p for p in log2phy[i, e] if p >= 0]
            assert len(phys) == logcnt[i, e] >= 1
            for p in phys:
                assert phy2log[i, p] == e
        # hierarchical: each device gets P/4 = 3 physical experts —
        # implicit in the layout (slots p belong to device p // 3)
    # hot experts get more replicas than cold ones on average
    hot = np.argmax(load[0])
    assert logcnt[0, hot] >= logcnt[0].min()


def test_eplb_state_and_weight_movement():
    import jax.numpy as jnp

    st = EplbState(num_layers=2, num_logical=4, num_physical=6,
                   num_devices=2, window=3)
    # identity prefix mapping before any stats
    assert st.phy2log.shape == (2, 6)
    st.record(0, np.array([90, 3, 3, 4]))
    st.record(1, np.array([10, 10, 10, 70]))
    phy2log, log2phy, logcnt = st.rearrange()
    assert logcnt[0, 0] == 3  # layer-0 hot expert triple-replicated
    assert logcnt[1, 3] == 3
    assert st.loads.sum() == 0  # window reset

    # weight movement: physical stack gathers the right experts
    rng = np.random.default_rng(0)
    stacked = jnp.asarray(rng.normal(size=(2, 4, 3, 5)))
    phys = st.build_physical_weights(stacked)
    assert phys.shape == (2, 6, 3, 5)
    for layer in range(2):
        for p in range(6):
            np.testing.assert_array_equal(
                np.asarray(phys[layer, p]),
                np.asarray(stacked[layer, phy2log[layer, p]]))


def test_translate_experts_round_robin():
    import jax.numpy as jnp

    st = EplbState(num_layers=1, num_logical=4, num_physical=6,
                   num_devices=2)
    st.record(0, np.array([100, 1, 1, 1]))
    phy2log, log2phy, logcnt = st.rearrange()
    experts = jnp.zeros((6, 2), dtype=jnp.int32)  # everyone picks e0
    phys = np.asarray(translate_experts(experts, log2phy, logcnt, 0))
    # spread across e0's replicas, all mapping back to logical 0
    used = set(phys.reshape(-1).tolist())
    assert len(used) == int(logcnt[0, 0])
    for p in used:
        assert phy2log[0, p] == 0


def test_physical_moe_matches_logical():
    """Routing through the physical (replicated) weights must produce
    EXACTLY the logical model's output."""
    import jax
    import jax.numpy as jnp

    from vllm_main_modify_tpu.layers.moe import moe_apply

    rng = np.random.default_rng(2)
    T, H, I, E = 10, 16, 32, 4
    x = jnp.asarray(rng.normal(size=(T, H)), jnp.float32)
    wg = jnp.asarray(rng.normal(size=(E, H, I)), jnp.float32)
    wu = jnp.asarray(rng.normal(size=(E, H, I)), jnp.float32)
    wd = jnp.asarray(rng.normal(size=(E, I, H)), jnp.float32)
    weights = jnp.asarray(rng.random(size=(T, 2)), jnp.float32)
    experts = jnp.asarray(rng.integers(0, E, size=(T, 2)), jnp.int32)
    act = lambda g, u: jax.nn.silu(g) * u
    ref = moe_apply(x, weights, experts, wg, wu, wd, act)

    st = EplbState(num_layers=1, num_logical=E, num_physical=6,
                   num_devices=2)
    st.record(0, np.array([50, 30, 10, 10]))
    phy2log, log2phy, logcnt = st.rearrange()
    wg_p = st.build_physical_weights(wg[None])[0]
    wu_p = st.build_physical_weights(wu[None])[0]
    wd_p = st.build_physical_weights(wd[None])[0]
    phys_experts = translate_experts(experts, log2phy, logcnt, 0)
    got = moe_apply(x, weights, phys_experts, wg_p, wu_p, wd_p, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

@pytest.fixture(scope="module")
def mixtral_dir(tmp_path_factory):
    import torch
    import transformers

    cfg = transformers.MixtralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        num_local_experts=4, num_experts_per_tok=2)
    torch.manual_seed(0)
    hf = transformers.MixtralForCausalLM(cfg).to(torch.float32).eval()
    path = tmp_path_factory.mktemp("models") / "tiny-mixtral"
    hf.save_pretrained(path, safe_serialization=True)
    from tests.conftest import _save_tiny_tokenizer

    _save_tiny_tokenizer(path)
    return str(path)


def test_eplb_engine_serving(mixtral_dir):
    """EPLB through the engine (reference: eplb_state.py +
    gpu_model_runner.py:1834): loads are tracked from the live
    router, the placement is rearranged on cadence, and generations
    stay IDENTICAL to the non-EPLB engine across rearrangements."""
    from vllm_main_modify_tpu.entrypoints.llm import LLM
    from vllm_main_modify_tpu.sampling_params import SamplingParams

    prompts = [{"prompt_token_ids": [7 * i + 3, 11, 13, 17 + i]}
               for i in range(4)]
    sp = SamplingParams(temperature=0.0, max_tokens=16,
                        ignore_eos=True)
    kw = dict(model=mixtral_dir, dtype="float32", max_model_len=128,
              max_num_seqs=8, max_num_batched_tokens=64, block_size=4,
              num_kv_blocks=128)
    ref = [list(o.outputs[0].token_ids)
           for o in LLM(**kw).generate(prompts, sp)]

    llm = LLM(**kw, enable_eplb=True, num_redundant_experts=4,
              eplb_window=3)
    runner = llm.engine.engine_core.model_runner
    st = runner.eplb_state
    assert st is not None and st.num_physical == 8
    init_phy2log = st.phy2log.copy()

    got = [list(o.outputs[0].token_ids)
           for o in llm.generate(prompts, sp)]
    assert got == ref  # physical placement must not change outputs

    # the window (3 steps) elapsed during decode: placement rearranged
    assert st.num_rearrangements >= 1
    # the rearrangement actually reacted to load (hot experts get the
    # redundant slots; with a random router the map almost surely
    # differs from the uniform-load initial packing)
    assert not np.array_equal(st.phy2log, init_phy2log)

    # and serving AFTER a rearrangement is still exact
    got2 = [list(o.outputs[0].token_ids)
            for o in llm.generate(prompts, sp)]
    assert got2 == ref

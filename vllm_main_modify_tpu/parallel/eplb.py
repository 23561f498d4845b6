"""EPLB: expert-parallelism load balancer.

Reference: vllm/distributed/eplb/ (rebalance_algo.py — the DeepSeek
EPLB algorithm — plus eplb_state.py load tracking and
rebalance_execute.py weight movement). TPU-native framing:

- loads are tracked as per-(layer, expert) token histograms taken from
  the router's top-k output (one tiny device `bincount` per MoE call,
  accumulated host-side);
- rebalancing produces a physical→logical expert map with redundant
  replicas of hot experts, hierarchically packed so each ICI
  neighborhood ("node") keeps its replicas local and each device gets
  an equal physical-expert count;
- applying a rearrangement on TPU is ONE gather on the stacked expert
  weights ([L, E_log, ...] → [L, E_phy, ...]) — no per-rank P2P
  choreography, GSPMD reshards the result;
- at routing time the logical top-k ids translate through
  ``log2phy`` with round-robin replica choice (token_idx % replicas).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


def balanced_packing(weight: np.ndarray, num_packs: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Pack n weighted items into m packs, n/m items each, minimizing
    pack-weight imbalance (greedy by descending weight)."""
    num_layers, n = weight.shape
    assert n % num_packs == 0
    per_pack = n // num_packs
    if per_pack == 1:
        idx = np.tile(np.arange(n), (num_layers, 1))
        return idx, np.zeros_like(idx)
    pack_index = np.full((num_layers, n), -1, dtype=np.int64)
    rank_in_pack = np.full_like(pack_index, -1)
    order = np.argsort(-weight.astype(np.float64), axis=-1)
    for i in range(num_layers):
        pack_w = [0.0] * num_packs
        pack_n = [0] * num_packs
        for g in order[i]:
            pack = min(
                (p for p in range(num_packs) if pack_n[p] < per_pack),
                key=pack_w.__getitem__)
            pack_index[i, g] = pack
            rank_in_pack[i, g] = pack_n[pack]
            pack_w[pack] += float(weight[i, g])
            pack_n[pack] += 1
    return pack_index, rank_in_pack


def replicate_experts(weight: np.ndarray, num_phy: int
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedily replicate the hottest experts (by load per replica)
    until ``num_phy`` physical slots are filled."""
    n, num_log = weight.shape
    assert num_phy >= num_log
    phy2log = np.tile(np.arange(num_phy, dtype=np.int64), (n, 1))
    rank = np.zeros((n, num_phy), dtype=np.int64)
    logcnt = np.ones((n, num_log), dtype=np.int64)
    rows = np.arange(n)
    for i in range(num_log, num_phy):
        hot = np.argmax(weight / logcnt, axis=-1)
        phy2log[:, i] = hot
        rank[:, i] = logcnt[rows, hot]
        logcnt[rows, hot] += 1
    return phy2log, rank, logcnt


def _inverse(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    rows = np.arange(perm.shape[0])[:, None]
    inv[rows, perm] = np.arange(perm.shape[1], dtype=np.int64)
    return inv


def rebalance_experts_hierarchical(
        weight: np.ndarray, num_physical_experts: int,
        num_groups: int, num_nodes: int, num_devices: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hierarchical policy: expert GROUPS pack to nodes (keep each
    group's experts on one ICI neighborhood), replicas are built
    within nodes, then physical experts pack evenly onto devices."""
    num_layers, num_log = weight.shape
    assert num_log % num_groups == 0
    group_size = num_log // num_groups
    assert num_groups % num_nodes == 0
    groups_per_node = num_groups // num_nodes
    assert num_devices % num_nodes == 0
    assert num_physical_experts % num_devices == 0
    phy_per_device = num_physical_experts // num_devices

    # 1) pack groups to nodes
    tokens_per_group = weight.reshape(num_layers, num_groups,
                                      group_size).sum(-1)
    g_pack, g_rank = balanced_packing(tokens_per_group, num_nodes)
    log2mlog = (((g_pack * groups_per_node + g_rank) *
                 group_size)[..., None] +
                np.arange(group_size)).reshape(num_layers, -1)
    mlog2log = _inverse(log2mlog)

    # 2) replicate within nodes
    rows = np.arange(num_layers)[:, None]
    tokens_per_mlog = weight[rows, mlog2log].reshape(
        -1, num_log // num_nodes)
    phy2mlog, phyrank, mlogcnt = replicate_experts(
        tokens_per_mlog, num_physical_experts // num_nodes)

    # 3) pack physical experts to devices
    nrows = np.arange(tokens_per_mlog.shape[0])[:, None]
    tokens_per_phy = (tokens_per_mlog / mlogcnt)[nrows, phy2mlog]
    p_pack, p_rank = balanced_packing(tokens_per_phy,
                                      num_devices // num_nodes)
    phy2pphy = p_pack * phy_per_device + p_rank
    pphy2phy = _inverse(phy2pphy)

    pphy2mlog = phy2mlog[nrows, pphy2phy]
    pphy2mlog = (pphy2mlog.reshape(num_layers, num_nodes, -1) +
                 np.arange(0, num_log,
                           num_log // num_nodes)[None, :, None]
                 ).reshape(num_layers, -1)
    pphy2log = log2mlog_take(mlog2log, pphy2mlog)
    pphyrank = phyrank[nrows, pphy2phy].reshape(num_layers, -1)
    logcnt = mlogcnt.reshape(num_layers, -1)[
        np.arange(num_layers)[:, None], log2mlog]
    return pphy2log, pphyrank, logcnt


def log2mlog_take(mlog2log: np.ndarray,
                  idx: np.ndarray) -> np.ndarray:
    rows = np.arange(mlog2log.shape[0])[:, None]
    return mlog2log[rows, idx]


def rebalance_experts(weight: np.ndarray, num_replicas: int,
                      num_groups: int, num_nodes: int,
                      num_devices: int
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Entry point (reference: rebalance_algo.py:185). Returns
    (phy2log [L, P], log2phy [L, E, R], logcnt [L, E])."""
    num_layers, num_log = weight.shape
    weight = np.asarray(weight, dtype=np.float64)
    if num_groups % num_nodes == 0:
        phy2log, phyrank, logcnt = rebalance_experts_hierarchical(
            weight, num_replicas, num_groups, num_nodes, num_devices)
    else:
        phy2log, phyrank, logcnt = rebalance_experts_hierarchical(
            weight, num_replicas, 1, 1, num_devices)
    max_cnt = num_replicas - num_log + 1
    log2phy = np.full((num_layers, num_log, max_cnt), -1,
                      dtype=np.int64)
    rows = np.arange(num_layers)[:, None]
    flat = log2phy.reshape(num_layers, -1)
    flat[rows, phy2log * max_cnt + phyrank] = np.arange(
        num_replicas, dtype=np.int64)
    return phy2log, log2phy, logcnt


# ---------------------------------------------------------------------


@dataclass
class EplbState:
    """Per-engine load tracking + rearrangement (reference:
    eplb_state.py EplbState)."""

    num_layers: int
    num_logical: int
    num_physical: int
    num_groups: int = 1
    num_nodes: int = 1
    num_devices: int = 1
    window: int = 1000  # steps per rebalance window
    loads: np.ndarray = field(init=False)
    step: int = 0
    num_rearrangements: int = 0
    phy2log: np.ndarray = field(init=False)
    log2phy: np.ndarray = field(init=False)
    logcnt: np.ndarray = field(init=False)

    def __post_init__(self) -> None:
        self.loads = np.zeros((self.num_layers, self.num_logical),
                              dtype=np.int64)
        # identity mapping + trailing replicas of expert 0
        self.phy2log, self.log2phy, self.logcnt = rebalance_experts(
            np.ones((self.num_layers, self.num_logical)),
            self.num_physical, self.num_groups, self.num_nodes,
            self.num_devices)

    def record(self, layer: int, expert_counts: np.ndarray) -> None:
        """Accumulate one step's per-LOGICAL-expert token counts."""
        self.loads[layer] += expert_counts.astype(np.int64)

    def should_rebalance(self) -> bool:
        self.step += 1
        return self.step % self.window == 0

    def rearrange(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Compute a fresh mapping from the accumulated window and
        reset the stats. Returns (phy2log, log2phy, logcnt)."""
        loads = np.maximum(self.loads, 1)
        self.phy2log, self.log2phy, self.logcnt = rebalance_experts(
            loads, self.num_physical, self.num_groups,
            self.num_nodes, self.num_devices)
        self.loads[:] = 0
        self.num_rearrangements += 1
        return self.phy2log, self.log2phy, self.logcnt

    # -- weight movement ------------------------------------------------

    def build_physical_weights(self, stacked, phy2log=None):
        """[L, E_log, ...] stacked expert tensor → [L, E_phy, ...]
        physical layout: ONE device gather per tensor
        (rebalance_execute.py's P2P choreography collapses under
        GSPMD)."""
        import jax.numpy as jnp

        p2l = self.phy2log if phy2log is None else phy2log
        idx = jnp.asarray(p2l)  # [L, P]
        return jnp.take_along_axis(
            stacked, idx.reshape(idx.shape[0], idx.shape[1],
                                 *([1] * (stacked.ndim - 2))), axis=1)


def translate_experts(experts, log2phy: np.ndarray,
                      logcnt: np.ndarray, layer: int):
    """Logical top-k ids [T, k] → physical replica ids, spreading
    tokens round-robin across each expert's replicas."""
    import jax.numpy as jnp

    l2p = jnp.asarray(log2phy[layer])  # [E, R]
    cnt = jnp.asarray(logcnt[layer])  # [E]
    t = experts.shape[0]
    tok = jnp.arange(t, dtype=jnp.int32)[:, None]
    replica = tok % jnp.take(cnt, experts)
    return jnp.take(l2p.reshape(-1),
                    experts * l2p.shape[1] + replica)

"""Weight loading: HF safetensors → GSPMD-sharded param pytree.

Reference capability: vllm/model_executor/model_loader/ (safetensors
streaming default loader + the TPU SPMD loader tpu.py:21 that loads on
CPU then shards). TPU-native version: each parameter is assembled on
host (stacking per-layer HF tensors into the model's layer-stacked
layout), then ``jax.device_put`` with its ``NamedSharding`` slices it
across the mesh — GSPMD replaces the reference's per-rank
``weight_loader`` protocol entirely.

Also supports ``load_format="dummy"`` (random init, for benchmarks) per
reference model_loader/dummy.py.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_main_modify_tpu.config import ModelConfig
from vllm_main_modify_tpu.models.interface import ParamSpec, transpose2d


def _set_path(tree: dict, path: str, value) -> None:
    keys = path.split(".")
    for k in keys[:-1]:
        tree = tree.setdefault(k, {})
    tree[keys[-1]] = value


def _hf_tensor_index(model_dir: str) -> dict[str, str]:
    """tensor name -> safetensors file path."""
    index_path = os.path.join(model_dir,
                              "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        return {
            k: os.path.join(model_dir, v)
            for k, v in index["weight_map"].items()
        }
    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if not files:
        # fairseq2-format checkpoints ship torch .pt files
        # (reference: fairseq2_llama.py allow_patterns_overrides
        # ["model.pt", "model.{rank}.pt"])
        pts = sorted(glob.glob(os.path.join(model_dir, "*.pt")))
        if pts:
            return {name: path for path in pts
                    for name in _pt_tensor_names(path)}
        raise FileNotFoundError(
            f"no .safetensors files under {model_dir}")
    from safetensors import safe_open

    out = {}
    for path in files:
        with safe_open(path, framework="numpy") as f:
            for name in f.keys():
                out[name] = path
    return out


def _pt_state_dict(path: str) -> dict:
    """torch .pt checkpoint → flat state dict, unwrapping fairseq2's
    {"model_key": name, name: state_dict} envelope
    (reference: fairseq2_llama.py:52-56)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False,
                     mmap=True)
    if isinstance(obj, dict) and "model_key" in obj:
        obj = obj[obj["model_key"]]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def _pt_tensor_names(path: str) -> list[str]:
    return [k for k, v in _pt_state_dict(path).items()
            if hasattr(v, "shape")]


class _TensorReader:
    """Caches open safetensors handles; returns numpy views."""

    def __init__(self, tensor_index: dict[str, str]) -> None:
        self._index = tensor_index
        self._handles: dict[str, object] = {}

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def get(self, name: str) -> np.ndarray:
        path = self._index[name]
        h = self._handles.get(path)
        if h is None:
            if path.endswith(".pt"):
                h = _pt_state_dict(path)
            else:
                from safetensors import safe_open

                h = safe_open(path, framework="numpy")
            self._handles[path] = h
        if isinstance(h, dict):
            t = h[name]
            if hasattr(t, "numpy"):
                import torch

                if t.dtype == torch.bfloat16:
                    t = t.float()
                return t.detach().numpy()
            return np.asarray(t)
        try:
            return h.get_tensor(name)
        except (TypeError, AttributeError):
            # dtypes numpy can't express through safetensors (fp8):
            # reread via the torch framework and view the raw bytes
            import ml_dtypes
            import torch
            from safetensors import safe_open

            with safe_open(path, framework="pt") as hp:
                t = hp.get_tensor(name)
            table = {
                torch.float8_e4m3fn: ml_dtypes.float8_e4m3fn,
                torch.float8_e5m2: ml_dtypes.float8_e5m2,
            }
            tgt = table.get(t.dtype)
            if tgt is None:
                raise
            return t.view(torch.uint8).numpy().view(np.dtype(tgt))


QUANT_EXCLUDE = ("embed", "lm_head", "router", "norm", "bias",
                 "shared_expert_gate",
                 # MLA absorption reshapes kv_b_proj per head at
                 # runtime (models/deepseek_v2.py); keep it dense
                 "kv_b_proj")


def _is_quantizable(spec: ParamSpec) -> bool:
    return (len(spec.shape) >= 2 and min(spec.shape[-2:]) >= 64
            and not any(k in spec.path for k in QUANT_EXCLUDE))


def _sub_sharding(mesh: Mesh, spec: ParamSpec, ndim_tail: int,
                  last_from_spec: bool):
    """Sharding for a derived leaf: keep the leading (layer/expert)
    axes, replicate the middle, optionally keep the out-axis entry."""
    entries = list(spec.sharding)
    lead = len(spec.shape) - 2
    out_entry = entries[-1] if len(entries) == len(spec.shape) else None
    derived = entries[:lead] + [None] * (ndim_tail - 1) + \
        [out_entry if last_from_spec else None]
    from jax.sharding import PartitionSpec

    return NamedSharding(mesh, PartitionSpec(*derived[:ndim_tail + lead]))


def _stage_shard_specs(specs: list, stage_axis: str) -> list:
    """Pipeline parallelism (parallel/pp.py): stacked per-layer specs
    shard their leading layer axis on the stage mesh axis."""
    from jax.sharding import PartitionSpec

    for s in specs:
        if s.stacked:
            entries = list(s.sharding)
            entries += [None] * (len(s.shape) - len(entries))
            entries[0] = stage_axis
            s.sharding = PartitionSpec(*entries)
    return specs


def load_model_weights(
    model,
    config: ModelConfig,
    mesh: Mesh,
    load_format: str = "auto",
    stage_axis: Optional[str] = None,
) -> dict:
    """Build the sharded param pytree for ``model`` (Model protocol)."""
    specs = model.param_specs()
    if stage_axis is not None:
        specs = _stage_shard_specs(specs, stage_axis)
    if load_format == "dummy":
        return init_dummy_params(model, config, mesh, specs=specs)

    reader = _TensorReader(_hf_tensor_index(config.model))
    dtype = config.jax_dtype
    quant = (config.quantization or "").lower() or None
    params: dict = {}
    for spec in specs:
        if quant and _is_quantizable(spec):
            value = _load_quantized(spec, reader, config, mesh, quant,
                                    dtype)
        else:
            host = _assemble_host_tensor(spec, reader, dtype)
            sharding = NamedSharding(mesh, spec.sharding)
            value = jax.device_put(jnp.asarray(host), sharding)
            del host
        _set_path(params, spec.path, value)
    return params


def _load_quantized(spec: ParamSpec, reader: _TensorReader, config,
                    mesh: Mesh, quant: str, dtype):
    """Quantized load: GPTQ/AWQ checkpoints repack to the canonical
    Int4Weight; int8/fp8/int4 quantize a float checkpoint on the fly
    (reference capability: quantization/{gptq,awq,fp8,...}.py +
    kernels/ repacking)."""
    from vllm_main_modify_tpu.quantization import weights as QW

    if quant in ("gptq", "awq", "gptq_w4a8", "awq_w4a8"):
        from vllm_main_modify_tpu.quantization.formats import (
            repack_awq, repack_gptq)

        w4a8 = quant.endswith("_w4a8")
        quant = quant.split("_")[0]

        base_key = spec.hf_key.rsplit(".weight", 1)[0]
        num_layers = spec.shape[0] if spec.stacked else 1
        packs, scs, zps, perms = [], [], [], []
        has_perm = False
        idx_range = range(num_layers) if spec.stacked else [None]
        for i in idx_range:
            def get(name, optional=False):
                key = (base_key.format(i=i + spec.layer_offset)
                       if i is not None else base_key) + "." + name
                if optional and key not in reader:
                    return None
                return reader.get(key)

            if quant == "gptq":
                sym = getattr(config.hf_config, "quantization_config",
                              None)
                v2 = bool(sym and (sym.get("checkpoint_format")
                                   if isinstance(sym, dict) else
                                   getattr(sym, "checkpoint_format",
                                           "")) == "gptq_v2")
                p_, s_, z_, perm = repack_gptq(
                    get("qweight"), get("qzeros"), get("scales"),
                    get("g_idx", optional=True),
                    sym_no_zero_offset=v2)
            else:
                p_, s_, z_, perm = repack_awq(
                    get("qweight"), get("qzeros"), get("scales"))
            packs.append(p_)
            scs.append(s_)
            zps.append(z_)
            perms.append(perm)
            has_perm |= perm is not None
        stack = (lambda xs: np.stack(xs)) if spec.stacked else             (lambda xs: xs[0])
        put = lambda a, last: jax.device_put(
            jnp.asarray(a), _sub_sharding(mesh, spec, a.ndim -
                                          (1 if spec.stacked else 0),
                                          last))
        perm_arr = None
        if has_perm:
            k = packs[0].shape[0]
            perm_arr = put(stack([
                p if p is not None else np.arange(k, dtype=np.int32)
                for p in perms
            ]), False)
        qw = QW.Int4Weight(put(stack(packs), True),
                           put(stack(scs), True),
                           put(stack(zps), True), perm_arr,
                           w4a8=w4a8)
        # W4A8 prefill runs the progressive-requant kernel; derive
        # its per-channel scale + integer group multipliers at load
        return QW.attach_requant(qw) if w4a8 else qw

    # MXFP4 checkpoints (GPT-OSS — reference: quantization/mxfp4.py):
    # HF "<name>_blocks" + "<name>_scales" (e8m0) pairs, or quantized
    # linear exports "<name>.weight" (packed u8) + ".weight_scale"
    if quant == "mxfp4":
        value = _load_mxfp4(spec, reader, mesh)
        if value is not None:
            return value

    # pre-quantized W8 checkpoints (compressed-tensors INT8 / HF FP8:
    # <proj>.weight int8|f8e4m3 + <proj>.weight_scale [out] f32 +
    # optional <proj>.input_scale — reference: fp8.py:209 scale
    # loading, compressed_tensors/ schemes)
    if quant in _SCALED_METHODS or quant == "fp8_block":
        # DeepSeek-style 128x128 block scales (reference: fp8.py
        # weight_block_size + weight_scale_inv)
        value = _load_fp8_block(spec, reader, config, mesh)
        if value is not None:
            return value
        value = _load_prequantized(spec, reader, config, mesh,
                                   "fp8_w8a8" if quant == "fp8_block"
                                   else quant)
        if value is not None:
            return value

    # on-the-fly quantization of a float checkpoint
    host = _assemble_host_tensor(spec, reader, dtype)
    arr = jax.device_put(jnp.asarray(host),
                         NamedSharding(mesh, spec.sharding))
    del host
    fn = _ON_THE_FLY.get(quant)
    if fn is None:
        raise ValueError(f"unknown quantization method {quant!r}")
    return fn(arr)


_SCALED_METHODS = ("int8", "fp8", "int8_w8a8", "fp8_w8a8", "w8a8",
                   "compressed-tensors")


def _quant_dtypes(quant: str):
    import ml_dtypes

    if "int8" in quant or quant in ("w8a8", "compressed-tensors"):
        return np.int8, None
    return np.dtype(ml_dtypes.float8_e4m3fn), ml_dtypes.float8_e4m3fn


def _load_mxfp4(spec: ParamSpec, reader: _TensorReader, mesh: Mesh):
    """MXFP4 checkpoint tensors → Mxfp4Weight (None if this param has
    no MXFP4 pair in the checkpoint — the float path then quantizes
    on the fly)."""
    from vllm_main_modify_tpu.quantization import weights as QW
    from vllm_main_modify_tpu.quantization.formats import repack_mxfp4

    base_key = spec.hf_key.rsplit(".weight", 1)[0]
    num_layers = spec.shape[0] if spec.stacked else 1
    idx_range = range(num_layers) if spec.stacked else [None]

    def keys(i):
        key = (base_key.format(i=(i + spec.layer_offset))
               if i is not None else base_key)
        for b, s in ((key + "_blocks", key + "_scales"),
                     (key + ".weight", key + ".weight_scale")):
            if b in reader and s in reader:
                return b, s
        return None

    if keys(0 if spec.stacked else None) is None:
        return None
    packs, scs = [], []
    for i in idx_range:
        bkey, skey = keys(i)
        s_u8 = reader.get(skey)
        if s_u8.dtype != np.uint8:
            return None  # not e8m0 — some other fp4 flavor
        p, s = repack_mxfp4(reader.get(bkey), s_u8)
        packs.append(p)
        scs.append(s)
    stack = (lambda xs: np.stack(xs)) if spec.stacked else \
        (lambda xs: xs[0])

    def put(a, last):
        return jax.device_put(
            jnp.asarray(a),
            _sub_sharding(mesh, spec,
                          a.ndim - (1 if spec.stacked else 0), last))

    return QW.Mxfp4Weight(put(stack(packs), True),
                          put(stack(scs), True))


def _load_fp8_block(spec: ParamSpec, reader: _TensorReader, config,
                    mesh: Mesh):
    """DeepSeek-style block-scaled FP8 → Fp8BlockWeight (None if the
    param carries no ``weight_scale_inv``). Tensors whose dims are not
    multiples of the block are dequantized to the model dtype at load
    (a handful of thin projections; the big matmuls stay fp8)."""
    from vllm_main_modify_tpu.quantization import weights as QW

    base_key = spec.hf_key.rsplit(".weight", 1)[0]
    probe = (base_key.format(i=spec.layer_offset)
             if spec.stacked else base_key) + ".weight_scale_inv"
    if probe not in reader:
        return None
    if spec.transform is not None and spec.transform is not transpose2d:
        return None
    import ml_dtypes

    f8 = np.dtype(ml_dtypes.float8_e4m3fn)
    qcfg = getattr(config.hf_config, "quantization_config", None)
    bs = (qcfg.get("weight_block_size")
          if isinstance(qcfg, dict) else
          getattr(qcfg, "weight_block_size", None)) or [128, 128]
    bn, bk = int(bs[0]), int(bs[1])  # torch [out, in] block order

    qs, ss = [], []
    dequant = False
    idx_range = (range(spec.shape[0]) if spec.stacked else [None])
    for i in idx_range:
        key = (base_key.format(i=i + spec.layer_offset)
               if i is not None else base_key)
        w = reader.get(key + ".weight")
        if w.dtype == np.uint8:
            w = w.view(f8)
        s = reader.get(key + ".weight_scale_inv").astype(np.float32)
        out_d, in_d = w.shape
        if out_d % bn or in_d % bk:
            dequant = True
        qs.append(np.ascontiguousarray(w.T))  # → [in, out]
        ss.append(np.ascontiguousarray(s.T))  # → [in/bk, out/bn]
    stack = (lambda xs: np.stack(xs)) if spec.stacked else \
        (lambda xs: xs[0])

    def put(a, last):
        return jax.device_put(
            jnp.asarray(a),
            _sub_sharding(mesh, spec,
                          a.ndim - (1 if spec.stacked else 0), last))

    if dequant:
        # ragged dims: expand scales elementwise on host, store bf16
        outs = []
        for w, s in zip(qs, ss):
            k_d, o_d = w.shape
            sk = np.repeat(s, bk, axis=0)[:k_d]
            so = np.repeat(sk, bn, axis=1)[:, :o_d]
            outs.append((w.astype(np.float32) * so).astype(
                ml_dtypes.bfloat16))
        return put(stack(outs), True)
    return QW.Fp8BlockWeight(put(stack(qs), True),
                             put(stack(ss), True), (bk, bn))


def _load_prequantized(spec: ParamSpec, reader: _TensorReader, config,
                       mesh: Mesh, quant: str):
    """Load checkpoint-provided int8/fp8 weights + scales directly.
    Returns None if this param has no ``weight_scale`` (then the float
    path quantizes on the fly)."""
    from vllm_main_modify_tpu.quantization import weights as QW

    base_key = spec.hf_key.rsplit(".weight", 1)[0]
    probe = (base_key.format(i=spec.layer_offset)
             if spec.stacked else base_key) + ".weight_scale"
    if probe not in reader:
        return None
    if spec.transform is not None and spec.transform is not transpose2d:
        return None  # model-specific transform: use the float path
    want_np, _f8 = _quant_dtypes(quant)

    qs, ss, acts = [], [], []
    has_act = True
    idx_range = (range(spec.shape[0]) if spec.stacked else [None])
    for i in idx_range:
        key = (base_key.format(i=i + spec.layer_offset)
               if i is not None else base_key)
        w = reader.get(key + ".weight")
        if w.dtype == np.uint8 and want_np != np.int8:
            w = w.view(want_np)  # safetensors fp8 fallback view
        assert w.dtype == want_np, (key, w.dtype, want_np)
        qs.append(np.ascontiguousarray(w.T))  # [out,in] -> [in,out]
        s = reader.get(key + ".weight_scale").astype(np.float32)
        s = s.reshape(-1)  # [out,1] / [out] / [1] (per-tensor)
        if s.shape[0] == 1:
            s = np.broadcast_to(s, (w.shape[0], )).copy()
        ss.append(s)
        akey = key + ".input_scale"
        if akey in reader:
            acts.append(
                reader.get(akey).astype(np.float32).reshape(1))
        else:
            has_act = False
    stack = (lambda xs: np.stack(xs)) if spec.stacked else \
        (lambda xs: xs[0])

    def put(a, last_from_spec):
        return jax.device_put(
            jnp.asarray(a),
            _sub_sharding(mesh, spec,
                          a.ndim - (1 if spec.stacked else 0),
                          last_from_spec))

    qweight = put(stack(qs), True)
    scale = put(stack(ss), True)
    act_scale = put(stack(acts), False) if has_act else None
    w8a8 = quant in ("int8_w8a8", "fp8_w8a8", "w8a8",
                     "compressed-tensors")
    if want_np == np.int8:
        return (QW.Int8W8A8Weight(qweight, scale, act_scale)
                if w8a8 else QW.Int8Weight(qweight, scale))
    return (QW.Fp8W8A8Weight(qweight, scale, act_scale)
            if w8a8 else QW.Fp8Weight(qweight, scale))


def _assemble_host_tensor(spec: ParamSpec, reader: _TensorReader,
                          dtype) -> np.ndarray:
    np_dtype = np.dtype(jnp.dtype(dtype).name) if jnp.dtype(dtype) != \
        jnp.bfloat16 else np.dtype("bfloat16")

    def fetch(name: str, want_shape=None) -> np.ndarray:
        if name not in reader and "." in name:
            # bare-backbone checkpoints (e.g. LlamaModel embedders,
            # original GPT-2) store tensors without the base-model
            # prefix ("model." / "transformer." / "gpt_neox." ...)
            stripped = name.split(".", 1)[1]
            if stripped in reader:
                name = stripped
        if name not in reader:
            if spec.fill_missing is not None and \
                    want_shape is not None:
                return np.full(want_shape, spec.fill_missing,
                               np_dtype)
            raise KeyError(f"missing HF tensor {name!r} "
                           f"for param {spec.path!r}")
        x = reader.get(name)
        if spec.transform is not None:
            x = spec.transform(x)
        return x

    if spec.stacked:
        num_layers = spec.shape[0]
        hf_layer = (lambda i: spec.layer_ids[i]) if spec.layer_ids \
            else (lambda i: i + spec.layer_offset)
        out = np.empty(spec.shape, dtype=np_dtype)
        if spec.num_experts > 0:
            for i in range(num_layers):
                for e in range(spec.num_experts):
                    x = fetch(spec.hf_key.format(
                        i=hf_layer(i), e=e + spec.expert_offset),
                              want_shape=spec.shape[2:])
                    assert x.shape == spec.shape[2:], (
                        f"{spec.path} layer {i} expert {e}: got "
                        f"{x.shape}, want {spec.shape[2:]}")
                    out[i, e] = x.astype(np_dtype)
            return out
        for i in range(num_layers):
            x = fetch(spec.hf_key_per_layer[i] if spec.hf_key_per_layer
                      else spec.hf_key.format(i=hf_layer(i)),
                      want_shape=spec.shape[1:])
            assert x.shape == spec.shape[1:], (
                f"{spec.path} layer {i}: got {x.shape}, "
                f"want {spec.shape[1:]}")
            out[i] = x.astype(np_dtype)
        return out
    x = fetch(spec.hf_key, want_shape=tuple(spec.shape))
    assert x.shape == tuple(spec.shape), (
        f"{spec.path}: got {x.shape}, want {spec.shape}")
    if np.issubdtype(x.dtype, np.integer):
        # integer tables (EAGLE-3 d2t) must never round-trip through
        # the model float dtype (bf16 corrupts ids > 256)
        return np.ascontiguousarray(x)
    return x.astype(np_dtype)


def init_dummy_params(model, config: ModelConfig, mesh: Mesh,
                      specs: Optional[list] = None) -> dict:
    """Random-init params sharded over the mesh (benchmarking without
    checkpoints; reference: model_loader/dummy loader)."""
    params: dict = {}
    key = jax.random.PRNGKey(config.seed)
    for spec in (specs if specs is not None else model.param_specs()):
        key, sub = jax.random.split(key)
        sharding = NamedSharding(mesh, spec.sharding)
        scale = 0.02 if len(spec.shape) > 1 else 1.0

        def init(k, shape=spec.shape, scale=scale):
            if scale == 1.0:
                return jnp.ones(shape, dtype=config.jax_dtype)
            return (jax.random.normal(k, shape, dtype=jnp.float32) *
                    scale).astype(config.jax_dtype)

        quant = (config.quantization or "").lower() or None
        if quant and _is_quantizable(spec):
            # generate directly in the quantized domain: routing a
            # dummy 8B through float init would transiently hold the
            # full bf16 tensor (OOM on a 16 GB chip), and benchmarks
            # only need the right shapes/dtypes/memory traffic
            arr = _dummy_quantized(spec, quant, mesh)
        else:
            arr = jax.jit(init, out_shardings=sharding)(sub)
        _set_path(params, spec.path, arr)
    return params


def _dummy_quantized(spec: ParamSpec, quant: str, mesh: Mesh):
    """Random quantized weights with the exact container layout the
    real loader would produce (no float intermediate)."""
    from vllm_main_modify_tpu.quantization import weights as QW

    *lead, k, o = spec.shape

    def put(shape, dtype, fill=None, last=True):
        sharding = _sub_sharding(mesh, spec, len(shape) - len(lead),
                                 last)

        def init():
            if fill is not None:
                return jnp.full(shape, fill, dtype=dtype)
            if dtype == jnp.int32:
                return jnp.broadcast_to(
                    jnp.arange(shape[-1], dtype=jnp.int32) *
                    0x11111111, shape)
            return jnp.full(shape, 0.01, dtype=dtype)

        return jax.jit(init, out_shardings=sharding)()

    if quant in ("int4", "gptq", "awq", "w4a8", "gptq_w4a8",
                 "awq_w4a8"):
        g = min(128, k)
        qw = QW.Int4Weight(
            put((*lead, k, o // 8), jnp.int32),
            put((*lead, k // g, o), jnp.float32, fill=0.01),
            put((*lead, k // g, o), jnp.float32, fill=8.0),
            w4a8=quant.endswith("w4a8"))
        return QW.attach_requant(qw) if qw.w4a8 else qw
    if quant in ("fp8_w8a8", "w8a8"):
        return QW.Fp8W8A8Weight(
            put((*lead, k, o), jnp.float8_e4m3fn, fill=0.02),
            put((*lead, o), jnp.float32, fill=1.0, last=True))
    if quant in ("int8_w8a8", "compressed-tensors"):
        return QW.Int8W8A8Weight(
            put((*lead, k, o), jnp.int8, fill=3),
            put((*lead, o), jnp.float32, fill=0.01, last=True))
    if quant == "int8":
        return QW.Int8Weight(put((*lead, k, o), jnp.int8, fill=3),
                             put((*lead, o), jnp.float32, fill=0.01,
                                 last=True))
    if quant == "fp8":
        return QW.Fp8Weight(put((*lead, k, o), jnp.float8_e4m3fn,
                                fill=0.02),
                            put((*lead, o), jnp.float32, fill=1.0,
                                last=True))
    if quant == "mxfp4":
        g = min(32, k)
        return QW.Mxfp4Weight(
            put((*lead, k, o // 2), jnp.uint8, fill=0x21),
            put((*lead, k // g, o), jnp.float32, fill=0.01))
    if quant == "fp8_block":
        bk, bn = min(128, k), min(128, o)
        return QW.Fp8BlockWeight(
            put((*lead, k, o), jnp.float8_e4m3fn, fill=0.02),
            put((*lead, k // bk, o // bn), jnp.float32, fill=1.0),
            (bk, bn))
    raise ValueError(f"unknown quantization method {quant!r}")


def _on_the_fly_table():
    from vllm_main_modify_tpu.quantization import weights as QW

    return {
        "int8": QW.quantize_int8,
        "fp8": QW.quantize_fp8,
        "int4": QW.quantize_int4,
        "gptq": QW.quantize_int4,
        "awq": QW.quantize_int4,
        "w4a8": QW.quantize_int4_w4a8,
        "gptq_w4a8": QW.quantize_int4_w4a8,
        "awq_w4a8": QW.quantize_int4_w4a8,
        "int8_w8a8": QW.quantize_int8_w8a8,
        "fp8_w8a8": QW.quantize_fp8_w8a8,
        "w8a8": QW.quantize_fp8_w8a8,
        "compressed-tensors": QW.quantize_int8_w8a8,
        "mxfp4": QW.quantize_mxfp4,
        "fp8_block": QW.quantize_fp8_block,
    }


class _LazyTable(dict):
    def __missing__(self, key):
        self.update(_on_the_fly_table())
        return dict.__getitem__(self, key)

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default


_ON_THE_FLY = _LazyTable()

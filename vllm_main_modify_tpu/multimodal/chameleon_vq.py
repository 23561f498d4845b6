"""Chameleon VQ-GAN image tokenizer (host-side, numpy).

Reference: vllm/model_executor/models/chameleon.py ChameleonVQVAE
(encoder + vector quantizer) and HF ChameleonImageVocabularyMapping.
Early fusion means images become DISCRETE tokens before the engine
sees them, so the encode runs at ingest on the host: conv stack →
nearest-codebook indices → IMGIMG bpe ids. The network is tiny next
to the LM (a few ms per image in numpy); keeping it off-device spares
the jitted step any image-shaped inputs.
"""

from __future__ import annotations

import numpy as np

_VQ_CACHE: dict[str, "ChameleonImageTokenizer"] = {}


def _conv2d(x: np.ndarray, w: np.ndarray, b: np.ndarray,
            stride: int = 1, pad=((1, 1), (1, 1))) -> np.ndarray:
    """x [C, H, W], w [O, C, kh, kw] → [O, H', W'] (im2col matmul)."""
    x = np.pad(x, ((0, 0), pad[0], pad[1]))
    o, c, kh, kw = w.shape
    win = np.lib.stride_tricks.sliding_window_view(
        x, (kh, kw), axis=(1, 2))[:, ::stride, ::stride]
    hh, ww = win.shape[1], win.shape[2]
    cols = win.transpose(1, 2, 0, 3, 4).reshape(hh * ww, c * kh * kw)
    y = cols @ w.reshape(o, -1).T + b
    return np.ascontiguousarray(y.reshape(hh, ww, o).transpose(2, 0, 1))


def _group_norm(x: np.ndarray, w: np.ndarray, b: np.ndarray,
                groups: int = 32, eps: float = 1e-6) -> np.ndarray:
    c = x.shape[0]
    g = x.reshape(groups, c // groups, -1)
    mu = g.mean(axis=(1, 2), keepdims=True)
    var = g.var(axis=(1, 2), keepdims=True)
    g = (g - mu) / np.sqrt(var + eps)
    return g.reshape(x.shape) * w[:, None, None] + b[:, None, None]


def _swish(x: np.ndarray) -> np.ndarray:
    return x / (1.0 + np.exp(-x))


class ChameleonImageTokenizer:
    """Loads the checkpoint's ``model.vqmodel.*`` weights once and
    turns [3, S, S] pixels into the decoder's bpe token ids."""

    def __init__(self, model_dir: str, hf_config) -> None:
        from vllm_main_modify_tpu.models.loader import (_hf_tensor_index,
                                                        _TensorReader)

        self.reader = _TensorReader(_hf_tensor_index(model_dir))
        vq = hf_config.vq_config
        get = (vq.get if isinstance(vq, dict)
               else lambda k, d=None: getattr(vq, k, d))
        self.mult = list(get("channel_multiplier"))
        self.num_res = int(get("num_res_blocks"))
        self.resolution = int(get("resolution"))
        self.attn_res = set(get("attn_resolutions") or [])
        self.codebook = self._t("model.vqmodel.quantize.embedding"
                                ".weight")
        # IMGIMG<letter-digits>Z name → VQ code id → bpe token id
        # (reference: ChameleonImageVocabularyMapping.img2bpe)
        chr_map = {chr(ord("A") + i): str(i) for i in range(10)}
        self.img2bpe: dict[int, int] = {}
        for name, tok in dict(hf_config.vocabulary_map).items():
            if not name.startswith("IMGIMG"):
                continue
            digits = "".join(chr_map.get(ch, ch)
                             for ch in name[len("IMGIMG"):-1])
            self.img2bpe[int(digits)] = int(tok)

    def _t(self, key: str) -> np.ndarray:
        return self.reader.get(key).astype(np.float32)

    def _resblock(self, prefix: str, x: np.ndarray) -> np.ndarray:
        h = _group_norm(x, self._t(prefix + "norm1.weight"),
                        self._t(prefix + "norm1.bias"))
        h = _conv2d(_swish(h), self._t(prefix + "conv1.weight"),
                    self._t(prefix + "conv1.bias"))
        h = _group_norm(h, self._t(prefix + "norm2.weight"),
                        self._t(prefix + "norm2.bias"))
        h = _conv2d(_swish(h), self._t(prefix + "conv2.weight"),
                    self._t(prefix + "conv2.bias"))
        if (prefix + "nin_shortcut.weight") in self.reader:
            x = _conv2d(x, self._t(prefix + "nin_shortcut.weight"),
                        self._t(prefix + "nin_shortcut.bias"),
                        pad=((0, 0), (0, 0)))
        elif (prefix + "conv_shortcut.weight") in self.reader:
            x = _conv2d(x, self._t(prefix + "conv_shortcut.weight"),
                        self._t(prefix + "conv_shortcut.bias"))
        return x + h

    def _attnblock(self, prefix: str, x: np.ndarray) -> np.ndarray:
        h = _group_norm(x, self._t(prefix + "norm.weight"),
                        self._t(prefix + "norm.bias"))
        c = h.shape[0]

        def p1x1(nm):
            return _conv2d(h, self._t(prefix + nm + ".weight"),
                           self._t(prefix + nm + ".bias"),
                           pad=((0, 0), (0, 0)))

        q = p1x1("q").reshape(c, -1).T  # [HW, C]
        k = p1x1("k").reshape(c, -1).T
        v = p1x1("v").reshape(c, -1).T
        att = (q @ k.T) * (c**-0.5)
        att = np.exp(att - att.max(axis=1, keepdims=True))
        att /= att.sum(axis=1, keepdims=True)
        o = (att @ v).T.reshape(x.shape)
        o = _conv2d(o, self._t(prefix + "proj_out.weight"),
                    self._t(prefix + "proj_out.bias"),
                    pad=((0, 0), (0, 0)))
        return x + o

    def encode(self, pixels: np.ndarray) -> list[int]:
        """[3, S, S] f32 (HF-normalized) → bpe token ids, row-major
        over the latent grid."""
        e = "model.vqmodel.encoder."
        x = _conv2d(pixels.astype(np.float32),
                    self._t(e + "conv_in.weight"),
                    self._t(e + "conv_in.bias"))
        res = self.resolution
        for i in range(len(self.mult)):
            for b in range(self.num_res):
                x = self._resblock(f"{e}down.{i}.block.{b}.", x)
                if res in self.attn_res:
                    x = self._attnblock(f"{e}down.{i}.attn.{b}.", x)
            if i != len(self.mult) - 1:
                # asymmetric (0,1,0,1) pad + stride-2 conv
                x = np.pad(x, ((0, 0), (0, 1), (0, 1)))
                x = _conv2d(x, self._t(f"{e}down.{i}.downsample.conv"
                                       ".weight"),
                            self._t(f"{e}down.{i}.downsample.conv"
                                    ".bias"),
                            stride=2, pad=((0, 0), (0, 0)))
                res //= 2
        x = self._resblock(e + "mid.block_1.", x)
        x = self._attnblock(e + "mid.attn_1.", x)
        x = self._resblock(e + "mid.block_2.", x)
        x = _group_norm(x, self._t(e + "norm_out.weight"),
                        self._t(e + "norm_out.bias"))
        x = _conv2d(_swish(x),
                    self._t(e + "conv_out.weight"),
                    self._t(e + "conv_out.bias"))
        x = _conv2d(x, self._t("model.vqmodel.quant_conv.weight"),
                    self._t("model.vqmodel.quant_conv.bias"),
                    pad=((0, 0), (0, 0)))
        z = x.reshape(x.shape[0], -1).T  # [HW, embed_dim]
        d = ((z**2).sum(1, keepdims=True) -
             2 * z @ self.codebook.T +
             (self.codebook**2).sum(1)[None, :])
        codes = d.argmin(axis=1)
        return [self.img2bpe[int(c)] for c in codes]


def image_tokenizer(model_config):
    key = model_config.model
    if key not in _VQ_CACHE:
        cls = (Emu3ImageTokenizer
               if "Emu3" in model_config.architecture
               else ChameleonImageTokenizer)
        _VQ_CACHE[key] = cls(key, model_config.hf_config)
    return _VQ_CACHE[key]


def _conv3d_causal(x: np.ndarray, w: np.ndarray, b,
                   t_stride: int = 1) -> np.ndarray:
    """Emu3VQVAEConv3d: causal temporal pad (kt-st, 0) + near-
    symmetric spatial pads; x [C, T, H, W], w [O, C, kt, kh, kw]."""
    o, c, kt, kh, kw = w.shape
    ph, pw = kh - 1, kw - 1
    x = np.pad(x, ((0, 0), (kt - t_stride, 0),
                   (ph // 2 + ph % 2, ph // 2),
                   (pw // 2 + pw % 2, pw // 2)))
    tt = (x.shape[1] - kt) // t_stride + 1
    out = np.empty((o, tt, x.shape[2] - kh + 1, x.shape[3] - kw + 1),
                   np.float32)
    for ti in range(tt):
        acc = None
        for dt in range(kt):
            y = _conv2d(x[:, ti * t_stride + dt], w[:, :, dt],
                        np.zeros(o, np.float32), pad=((0, 0), (0, 0)))
            acc = y if acc is None else acc + y
        out[:, ti] = acc
    if b is not None:
        out += np.asarray(b, np.float32)[:, None, None, None]
    return out


class Emu3ImageTokenizer:
    """Emu3 VQ-GAN encoder (reference: vllm emu3 + HF Emu3VQVAE
    encode): spatial stack per frame (an image repeats
    temporal_downsample_factor times), causal temporal conv stack with
    eval-mode BatchNorm3d residual blocks, 3x1x1 quant conv, nearest-
    codebook indices; each latent row maps to bpe ids + an EOL
    token."""

    def __init__(self, model_dir: str, hf_config) -> None:
        from vllm_main_modify_tpu.models.loader import (_hf_tensor_index,
                                                        _TensorReader)

        self.reader = _TensorReader(_hf_tensor_index(model_dir))
        vq = hf_config.vq_config
        get = (vq.get if isinstance(vq, dict)
               else lambda k, d=None: getattr(vq, k, d))
        self.mult = list(get("channel_multiplier"))
        self.num_res = int(get("num_res_blocks"))
        self.attn_levels = set(get("attn_resolutions") or [])
        self.temporal = int(get("temporal_downsample_factor", 4))
        self.prefix = ("model.vqmodel."
                       if "model.vqmodel.quantize.embedding.weight"
                       in self.reader else "vqmodel.")
        self.codebook = self._t(self.prefix +
                                "quantize.embedding.weight")
        # "<|visual token XXXXXX|>" → code id XXXXXX (reference:
        # Emu3ImageVocabularyMapping.img2bpe) + per-row EOL
        self.img2bpe: dict[int, int] = {}
        vm = dict(hf_config.vocabulary_map)
        for name, tok in vm.items():
            if name.startswith("<|visual token"):
                self.img2bpe[int(name[-8:-2])] = int(tok)
        self.eol = int(vm["<|extra_200|>"])

    def _t(self, key: str) -> np.ndarray:
        return self.reader.get(key).astype(np.float32)

    def _resblock(self, p: str, x: np.ndarray) -> np.ndarray:
        h = _group_norm(x, self._t(p + "norm1.weight"),
                        self._t(p + "norm1.bias"))
        h = _conv2d(_swish(h), self._t(p + "conv1.weight"),
                    self._t(p + "conv1.bias"))
        h = _group_norm(h, self._t(p + "norm2.weight"),
                        self._t(p + "norm2.bias"))
        h = _conv2d(_swish(h), self._t(p + "conv2.weight"),
                    self._t(p + "conv2.bias"))
        if (p + "nin_shortcut.weight") in self.reader:
            x = _conv2d(x, self._t(p + "nin_shortcut.weight"),
                        self._t(p + "nin_shortcut.bias"),
                        pad=((0, 0), (0, 0)))
        return x + h

    def _attn(self, p: str, norm_p: str, x: np.ndarray) -> np.ndarray:
        h = _group_norm(x, self._t(norm_p + ".weight"),
                        self._t(norm_p + ".bias"))
        c, hh, ww = h.shape
        t = h.reshape(c, hh * ww).T  # [HW, C]
        q = t @ self._t(p + "q_proj.weight").T + \
            self._t(p + "q_proj.bias")
        k = t @ self._t(p + "k_proj.weight").T + \
            self._t(p + "k_proj.bias")
        v = t @ self._t(p + "v_proj.weight").T + \
            self._t(p + "v_proj.bias")
        att = (q @ k.T) * (c**-0.5)  # single head unless configured
        att = np.exp(att - att.max(axis=1, keepdims=True))
        att /= att.sum(axis=1, keepdims=True)
        o = att @ v
        o = o @ self._t(p + "out_proj.weight").T + \
            self._t(p + "out_proj.bias")
        return x + o.T.reshape(c, hh, ww)

    def _bn3d(self, p: str, x: np.ndarray) -> np.ndarray:
        mean = self._t(p + "running_mean")[:, None, None, None]
        var = self._t(p + "running_var")[:, None, None, None]
        w = self._t(p + "weight")[:, None, None, None]
        b = self._t(p + "bias")[:, None, None, None]
        return (x - mean) / np.sqrt(var + 1e-5) * w + b

    def encode(self, pixels: np.ndarray) -> list[int]:
        e = self.prefix + "encoder."
        x = _conv2d(pixels.astype(np.float32),
                    self._t(e + "conv_in.weight"),
                    self._t(e + "conv_in.bias"))
        for i in range(len(self.mult)):
            for bi in range(self.num_res):
                x = self._resblock(f"{e}down_block.down.{i}.block"
                                   f".{bi}.", x)
                if i in self.attn_levels:
                    x = self._attn(
                        f"{e}down_block.down.{i}.attn.{bi}.",
                        f"{e}down_block.down.{i}.attn_norms.{bi}", x)
            if i != len(self.mult) - 1:
                x = np.pad(x, ((0, 0), (0, 1), (0, 1)))
                x = _conv2d(x, self._t(f"{e}down_block.down.{i}"
                                       ".downsample.conv.weight"),
                            self._t(f"{e}down_block.down.{i}"
                                    ".downsample.conv.bias"),
                            stride=2, pad=((0, 0), (0, 0)))
        x = self._resblock(e + "middle_block.block_1.", x)
        x = self._attn(e + "middle_block.attn_1.",
                       e + "middle_block.attn_norm", x)
        x = self._resblock(e + "middle_block.block_2.", x)
        x = _group_norm(x, self._t(e + "norm_out.weight"),
                        self._t(e + "norm_out.bias"))
        x = _conv2d(_swish(x), self._t(e + "conv_out.weight"),
                    self._t(e + "conv_out.bias"))
        # temporal stack over the repeated frame
        x = np.broadcast_to(x[:, None], (x.shape[0], self.temporal,
                                         *x.shape[1:])).copy()
        n_tc = max(int(np.log2(self.temporal)), 1)
        for i in range(n_tc):
            x = _conv3d_causal(
                x, self._t(f"{e}time_conv.{i}.conv.conv.weight"),
                self._t(f"{e}time_conv.{i}.conv.conv.bias"),
                t_stride=2)
            x = _swish(x)
        j = 0
        while f"{e}time_res_stack.{j}.norm1.weight" in self.reader:
            p = f"{e}time_res_stack.{j}."
            res = x
            h = _swish(self._bn3d(p + "norm1.", x))
            h = _conv3d_causal(h, self._t(p + "conv1.conv.conv.weight")
                               if (p + "conv1.conv.conv.weight")
                               in self.reader else
                               self._t(p + "conv1.conv.weight"),
                               self._t(p + "conv1.conv.conv.bias")
                               if (p + "conv1.conv.conv.bias")
                               in self.reader else
                               self._t(p + "conv1.conv.bias"))
            h = _swish(self._bn3d(p + "norm2.", h))
            h = _conv3d_causal(h, self._t(p + "conv2.conv.conv.weight")
                               if (p + "conv2.conv.conv.weight")
                               in self.reader else
                               self._t(p + "conv2.conv.weight"),
                               self._t(p + "conv2.conv.bias")
                               if (p + "conv2.conv.bias")
                               in self.reader else None)
            x = res + h
            j += 1
        # quant conv (3,1,1) causal on [C, T, H, W]
        x = _conv3d_causal(
            x, self._t(self.prefix + "quant_conv.conv.weight"),
            self._t(self.prefix + "quant_conv.conv.bias"))
        # image: take the (single) remaining temporal slice
        z = x[:, 0]  # [embed, h, w]
        c, hh, ww = z.shape
        zf = z.reshape(c, hh * ww).T
        d = ((zf**2).sum(1, keepdims=True) - 2 * zf @ self.codebook.T
             + (self.codebook**2).sum(1)[None, :])
        codes = d.argmin(axis=1).reshape(hh, ww)
        out: list[int] = []
        for row in codes:
            out.extend(self.img2bpe[int(cc)] for cc in row)
            out.append(self.eol)
        return out

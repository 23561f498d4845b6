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


def image_tokenizer(model_config) -> ChameleonImageTokenizer:
    key = model_config.model
    if key not in _VQ_CACHE:
        _VQ_CACHE[key] = ChameleonImageTokenizer(
            key, model_config.hf_config)
    return _VQ_CACHE[key]

"""Torch oracle of the Depth Pro architecture for parity testing.

A compact torch implementation with the reference's state-dict key
layout (so ``ckpt/convert.py`` consumes it unmodified) and the
reference's documented forward semantics: 3-level pyramid, 5x5/3x3/1x1
overlapping split, block-{h0,h1} captures, trim-merge, DPT fusion
decoder, FOV head, and the infer() f_px/clamp math. Used only in tests,
with random weights, as the numerical reference for the JAX model.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from ml_depth_pro_video_tpu.models.depth_pro import DepthProConfig
from ml_depth_pro_video_tpu.models.vit import ViTConfig


class TorchBlock(nn.Module):
    """timm-style ViT block (pre-norm, LayerScale, exact GELU)."""

    def __init__(self, d, heads, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn = nn.ModuleDict({"qkv": nn.Linear(d, 3 * d), "proj": nn.Linear(d, d)})
        self.ls1 = nn.ParameterDict({"gamma": nn.Parameter(torch.rand(d) * 0.1)})
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.ModuleDict(
            {"fc1": nn.Linear(d, mlp_ratio * d), "fc2": nn.Linear(mlp_ratio * d, d)}
        )
        self.ls2 = nn.ParameterDict({"gamma": nn.Parameter(torch.rand(d) * 0.1)})
        self.heads = heads

    def forward(self, x):
        b, s, d = x.shape
        h = self.norm1(x)
        qkv = self.attn["qkv"](h).reshape(b, s, 3, self.heads, d // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        a = F.scaled_dot_product_attention(q, k, v)
        x = x + self.ls1["gamma"] * self.attn["proj"](a.transpose(1, 2).reshape(b, s, d))
        h = self.mlp["fc2"](F.gelu(self.mlp["fc1"](self.norm2(x))))
        return x + self.ls2["gamma"] * h


class TorchViT(nn.Module):
    def __init__(self, cfg: ViTConfig):
        super().__init__()
        d = cfg.embed_dim
        self.patch_embed = nn.ModuleDict(
            {"proj": nn.Conv2d(3, d, cfg.patch_size, stride=cfg.patch_size)}
        )
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, cfg.num_tokens, d) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchBlock(d, cfg.num_heads, cfg.mlp_ratio) for _ in range(cfg.depth)]
        )
        self.norm = nn.LayerNorm(d, eps=1e-6)

    def forward(self, x, capture=()):
        b = x.shape[0]
        t = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1) + self.pos_embed
        caps = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in capture:
                caps.append(t)
        return self.norm(t), caps


def _upsample_seq(d_in, d_out, n, d_int=None):
    d_int = d_int or d_out
    layers = [nn.Conv2d(d_in, d_int, 1, bias=False)]
    for i in range(n):
        layers.append(nn.ConvTranspose2d(d_int if i == 0 else d_out, d_out, 2, 2, bias=False))
    return nn.Sequential(*layers)


class TorchEncoder(nn.Module):
    def __init__(self, cfg: DepthProConfig):
        super().__init__()
        self.cfg = cfg
        d = cfg.vit.embed_dim
        dims = cfg.dims_encoder
        self.patch_encoder = TorchViT(cfg.vit)
        self.image_encoder = TorchViT(cfg.vit)
        self.upsample_latent0 = _upsample_seq(d, cfg.decoder_features, 3, d_int=dims[0])
        self.upsample_latent1 = _upsample_seq(d, dims[0], 2)
        self.upsample0 = _upsample_seq(d, dims[1], 1)
        self.upsample1 = _upsample_seq(d, dims[2], 1)
        self.upsample2 = _upsample_seq(d, dims[3], 1)
        self.upsample_lowres = nn.ConvTranspose2d(d, dims[3], 2, 2, bias=True)
        self.fuse_lowres = nn.Conv2d(2 * dims[3], dims[3], 1, bias=True)

    def _split(self, x, overlap):
        p = self.cfg.vit.img_size
        stride = int(p * (1 - overlap))
        steps = math.ceil((x.shape[-1] - p) / stride) + 1
        tiles = [
            x[..., j * stride : j * stride + p, i * stride : i * stride + p]
            for j in range(steps)
            for i in range(steps)
        ]
        return torch.cat(tiles, dim=0)

    def _merge(self, x, batch, pad):
        steps = int(math.isqrt(x.shape[0] // batch))
        g = x.shape[-1]
        rows = []
        for j in range(steps):
            cols = []
            for i in range(steps):
                t = x[(j * steps + i) * batch : (j * steps + i + 1) * batch]
                t = t[..., (pad if j > 0 else 0) : g - (pad if j < steps - 1 else 0),
                      (pad if i > 0 else 0) : g - (pad if i < steps - 1 else 0)]
                cols.append(t)
            rows.append(torch.cat(cols, dim=-1))
        return torch.cat(rows, dim=-2)

    def _grid(self, tokens):
        g = self.cfg.vit.grid_size
        b, _, c = tokens.shape
        return tokens[:, 1:, :].reshape(b, g, g, c).permute(0, 3, 1, 2)

    def forward(self, x):
        b = x.shape[0]
        g = self.cfg.vit.grid_size
        pad0, pad1 = g // 8, g // 4
        x1 = F.interpolate(x, scale_factor=0.5, mode="bilinear", align_corners=False)
        x2 = F.interpolate(x, scale_factor=0.25, mode="bilinear", align_corners=False)
        pyramid = torch.cat([self._split(x, 0.25), self._split(x1, 0.5), x2], dim=0)
        tokens, (h0, h1) = self.patch_encoder(pyramid, capture=self.cfg.hook_block_ids)
        n0 = 25 * b
        latent0 = self._merge(self._grid(h0[:n0]), b, pad0)
        latent1 = self._merge(self._grid(h1[:n0]), b, pad0)
        feat = self._grid(tokens)
        x0f = self._merge(feat[:n0], b, pad0)
        x1f = self._merge(feat[n0 : n0 + 9 * b], b, pad1)
        x2f = feat[n0 + 9 * b :]
        globf = self._grid(self.image_encoder(x2)[0])
        latent0 = self.upsample_latent0(latent0)
        latent1 = self.upsample_latent1(latent1)
        x0f = self.upsample0(x0f)
        x1f = self.upsample1(x1f)
        x2f = self.upsample2(x2f)
        globf = self.upsample_lowres(globf)
        fused = self.fuse_lowres(torch.cat([x2f, globf], dim=1))
        return [latent0, latent1, x0f, x1f, fused]


class TorchResidual(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.residual = nn.Sequential(
            nn.ReLU(), nn.Conv2d(d, d, 3, padding=1), nn.ReLU(), nn.Conv2d(d, d, 3, padding=1)
        )

    def forward(self, x):
        return x + self.residual(x)


class TorchFusion(nn.Module):
    def __init__(self, d, deconv):
        super().__init__()
        self.resnet1 = TorchResidual(d)
        self.resnet2 = TorchResidual(d)
        if deconv:
            self.deconv = nn.ConvTranspose2d(d, d, 2, 2, bias=False)
        self.out_conv = nn.Conv2d(d, d, 1, bias=True)

    def forward(self, x0, x1=None):
        x = x0 if x1 is None else x0 + self.resnet1(x1)
        x = self.resnet2(x)
        if hasattr(self, "deconv"):
            x = self.deconv(x)
        return self.out_conv(x)


class TorchDecoder(nn.Module):
    def __init__(self, cfg: DepthProConfig):
        super().__init__()
        dims = (cfg.decoder_features,) + tuple(cfg.dims_encoder)
        d = cfg.decoder_features
        self.convs = nn.ModuleList(
            [nn.Identity()] + [nn.Conv2d(dim, d, 3, padding=1, bias=False) for dim in dims[1:]]
        )
        self.fusions = nn.ModuleList([TorchFusion(d, i != 0) for i in range(len(dims))])

    def forward(self, enc):
        feats = self.convs[-1](enc[-1])
        lowres = feats
        feats = self.fusions[-1](feats)
        for i in range(len(enc) - 2, -1, -1):
            feats = self.fusions[i](feats, self.convs[i](enc[i]))
        return feats, lowres


class TorchFOV(nn.Module):
    def __init__(self, cfg: DepthProConfig):
        super().__init__()
        d = cfg.decoder_features
        kd = max(cfg.vit.grid_size // 4, 1)
        self.encoder = nn.Sequential(TorchViT(cfg.vit), nn.Linear(cfg.vit.embed_dim, d // 2))
        self.downsample = nn.Sequential(nn.Conv2d(d, d // 2, 3, 2, 1), nn.ReLU())
        self.head = nn.Sequential(
            nn.Conv2d(d // 2, d // 4, 3, 2, 1), nn.ReLU(),
            nn.Conv2d(d // 4, d // 8, 3, 2, 1), nn.ReLU(),
            nn.Conv2d(d // 8, 1, kd),
        )

    def forward(self, x, lowres):
        x = F.interpolate(x, scale_factor=0.25, mode="bilinear", align_corners=False)
        t = self.encoder[1](self.encoder[0](x)[0])[:, 1:].permute(0, 2, 1)
        lo = self.downsample(lowres)
        return self.head(t.reshape_as(lo) + lo)


class TorchDepthPro(nn.Module):
    def __init__(self, cfg: DepthProConfig):
        super().__init__()
        d = cfg.decoder_features
        self.cfg = cfg
        self.encoder = TorchEncoder(cfg)
        self.decoder = TorchDecoder(cfg)
        self.head = nn.Sequential(
            nn.Conv2d(d, d // 2, 3, padding=1),
            nn.ConvTranspose2d(d // 2, d // 2, 2, 2, bias=True),
            nn.Conv2d(d // 2, 32, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(),
        )
        if cfg.use_fov_head:
            self.fov = TorchFOV(cfg)

    def forward(self, x):
        enc = self.encoder(x)
        feats, lowres = self.decoder(enc)
        canonical = self.head(feats)
        fov = self.fov(x, lowres.detach()) if self.cfg.use_fov_head else None
        return canonical, fov

    @torch.no_grad()
    def infer(self, x, f_px=None):
        if x.dim() == 3:
            x = x[None]
        _, _, h, w = x.shape
        s = self.cfg.img_size
        resize = h != s or w != s
        if resize:
            x = F.interpolate(x, size=(s, s), mode="bilinear", align_corners=False)
        canonical, fov_deg = self.forward(x)
        if f_px is None:
            f_px = 0.5 * w / torch.tan(0.5 * torch.deg2rad(fov_deg.float()))
        inv = canonical * (w / f_px)
        if resize:
            inv = F.interpolate(inv, size=(h, w), mode="bilinear", align_corners=False)
        depth = 1.0 / torch.clamp(inv, min=1e-4, max=1e4)
        return {"depth": depth.squeeze(), "focallength_px": torch.as_tensor(f_px).squeeze()}

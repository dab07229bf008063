"""Import the ACTUAL reference torch modules for parity testing.

The reference network modules (`/root/reference/src/depth_pro/network/
encoder.py`, `decoder.py`, `fov.py`, and the `DepthPro` container in
`depth_pro.py`) import only torch; timm/torchvision/pillow_heif are
needed only by the factory paths we do not call. We stub those three in
``sys.modules``, import the real classes, and instantiate the real
module tree with a tiny timm-layout ViT backbone (the reference factory
returns the raw timm model, `network/vit_factory.py:124`, so the
backbone's own keys appear directly under ``encoder.patch_encoder.``).

This anchors parity tests and ``ckpt/convert.py`` to the reference
code itself rather than to a hand-written oracle: the converter consumes
the state dict emitted by the real module tree, unmodified.

NOTE: the reference encoder hardcodes 384px patches and merge paddings
3/6 (`encoder.py:176,279-302`) and the FOV head a 6x6 final conv
(`fov.py:39`), so the real tree only wires up at the real topology:
backbone img 384 / grid 24, network input 1536. Tiny embed dims keep
that CPU-tractable.
"""

import sys
import types

import torch
import torch.nn as nn

from ml_depth_pro_video_tpu.models.vit import ViTConfig
from torch_oracle import TorchViT


def _install_stub_modules() -> None:
    """Register import-time stand-ins for timm/torchvision/pillow_heif.

    Only module attributes touched at import time of the reference
    package are provided; none of the stubbed functionality is executed
    by the tests (we never call create_vit / the transform / load_rgb).
    """
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_layers = types.ModuleType("timm.layers")
        timm_layers.resample_abs_pos_embed = None
        timm.layers = timm_layers
        timm.create_model = None
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = timm_layers
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        for name in ("Compose", "ConvertImageDtype", "Lambda", "Normalize", "ToTensor"):
            setattr(tvt, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    if "pillow_heif" not in sys.modules:
        ph = types.ModuleType("pillow_heif")
        ph.register_heif_opener = lambda *a, **k: None
        ph.open_heif = None
        sys.modules["pillow_heif"] = ph


_install_stub_modules()
if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

from depth_pro.depth_pro import DepthPro as ReferenceDepthPro  # noqa: E402
from depth_pro.network.decoder import MultiresConvDecoder  # noqa: E402
from depth_pro.network.encoder import DepthProEncoder  # noqa: E402
from depth_pro.network.fov import FOVNetwork  # noqa: E402

__all__ = [
    "ReferenceDepthPro",
    "MultiresConvDecoder",
    "DepthProEncoder",
    "FOVNetwork",
    "StubTimmBackbone",
    "build_reference_model",
]


class StubTimmBackbone(TorchViT):
    """Tiny ViT with the exact interface/key layout `create_vit` returns.

    The reference encoder consumes the raw timm model: it reads
    ``embed_dim``, ``patch_embed.img_size``/``patch_size``, registers
    forward hooks on ``blocks[i]`` (`encoder.py:132-144`), and calls the
    module as ``forward_features`` returning (B, 1+N, C) tokens. State
    dict keys match timm's DINOv2 ViT (patch_embed.proj, cls_token,
    pos_embed, blocks.N.{norm1,attn.qkv,attn.proj,ls1.gamma,...}, norm).
    """

    def __init__(self, cfg: ViTConfig):
        super().__init__(cfg)
        self.embed_dim = cfg.embed_dim
        self.patch_embed.img_size = (cfg.img_size, cfg.img_size)
        self.patch_embed.patch_size = (cfg.patch_size, cfg.patch_size)

    def forward(self, x):
        tokens, _ = TorchViT.forward(self, x)
        return tokens


def build_reference_model(cfg) -> ReferenceDepthPro:
    """Instantiate the real reference DepthPro tree with stub backbones.

    Mirrors `create_model_and_transforms` wiring
    (`depth_pro.py:91-120`) minus the timm factory.
    """
    encoder = DepthProEncoder(
        dims_encoder=list(cfg.dims_encoder),
        patch_encoder=StubTimmBackbone(cfg.vit),
        image_encoder=StubTimmBackbone(cfg.vit),
        hook_block_ids=list(cfg.hook_block_ids),
        decoder_features=cfg.decoder_features,
    )
    decoder = MultiresConvDecoder(
        dims_encoder=[cfg.decoder_features] + list(cfg.dims_encoder),
        dim_decoder=cfg.decoder_features,
    )
    model = ReferenceDepthPro(
        encoder=encoder,
        decoder=decoder,
        last_dims=(32, 1),
        use_fov_head=cfg.use_fov_head,
        fov_encoder=StubTimmBackbone(cfg.vit) if cfg.use_fov_head else None,
    )
    return model.eval()

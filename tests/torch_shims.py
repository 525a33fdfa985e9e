"""Minimal stubs for torch-ecosystem deps (timm/detectron2/fvcore) that the
vendored reference modules import but this image lacks. Installing these lets
parity tests load reference code unmodified."""
import sys
import types


def install():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    import importlib.machinery

    def mod(name):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        # transformers probes importlib.util.find_spec on optional deps;
        # a spec-less module raises ValueError, so fabricate one
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m
        return m

    # ---- timm.models.layers
    timm = mod("timm")
    timm_models = mod("timm.models")
    layers = mod("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = layers
    # GLIGEN's vendored convnext does `from timm.models.registry import
    # register_model`; the fabricated timm.models must behave like a package
    timm_models.__path__ = []
    registry = mod("timm.models.registry")
    registry.register_model = lambda fn: fn
    timm_models.registry = registry

    # ---- timm.create_model: minimal replicas of the backbones the vendored
    # MiDaS vit.py builds (vit_base_resnet50_384 hybrid). State-dict names
    # mirror real timm so converters built against this also load real ckpts.
    import math
    from collections import OrderedDict

    def _pad_same(x, k, s, d=1, value=0.0):
        ih, iw = x.shape[-2:]

        def _amount(i):
            return max((math.ceil(i / s) - 1) * s + (k - 1) * d + 1 - i, 0)

        ph, pw = _amount(ih), _amount(iw)
        return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2], value=value)

    class StdConv2dSame(nn.Conv2d):
        def __init__(self, in_c, out_c, k, stride=1, eps=1e-8):
            super().__init__(in_c, out_c, k, stride=stride, padding=0, bias=False)
            self.eps = eps

        def forward(self, x):
            w = F.batch_norm(
                self.weight.reshape(1, self.out_channels, -1), None, None,
                training=True, momentum=0.0, eps=self.eps).reshape_as(self.weight)
            x = _pad_same(x, self.kernel_size[0], self.stride[0])
            return F.conv2d(x, w, None, self.stride)

    class MaxPool2dSame(nn.Module):
        def forward(self, x):
            return F.max_pool2d(_pad_same(x, 3, 2, value=float("-inf")), 3, 2)

    class GroupNormAct(nn.GroupNorm):
        def __init__(self, ch, groups=32, apply_act=True):
            super().__init__(groups, ch)
            self.apply_act = apply_act

        def forward(self, x):
            x = super().forward(x)
            return F.relu(x) if self.apply_act else x

    class _Downsample(nn.Module):
        def __init__(self, cin, cout, stride, groups):
            super().__init__()
            self.conv = StdConv2dSame(cin, cout, 1, stride)
            self.norm = GroupNormAct(cout, groups, apply_act=False)

        def forward(self, x):
            return self.norm(self.conv(x))

    class _RNBottleneck(nn.Module):
        def __init__(self, cin, cout, stride, groups):
            super().__init__()
            mid = cout // 4
            self.downsample = (_Downsample(cin, cout, stride, groups)
                               if cin != cout or stride != 1 else None)
            self.conv1 = StdConv2dSame(cin, mid, 1)
            self.norm1 = GroupNormAct(mid, groups)
            self.conv2 = StdConv2dSame(mid, mid, 3, stride)
            self.norm2 = GroupNormAct(mid, groups)
            self.conv3 = StdConv2dSame(mid, cout, 1)
            self.norm3 = GroupNormAct(cout, groups, apply_act=False)

        def forward(self, x):
            sc = x if self.downsample is None else self.downsample(x)
            x = self.norm1(self.conv1(x))
            x = self.norm2(self.conv2(x))
            x = self.norm3(self.conv3(x))
            return F.relu(x + sc)

    class _RNStage(nn.Module):
        def __init__(self, cin, cout, n, stride, groups):
            super().__init__()
            self.blocks = nn.Sequential(*[
                _RNBottleneck(cin if i == 0 else cout, cout,
                              stride if i == 0 else 1, groups)
                for i in range(n)])

        def forward(self, x):
            return self.blocks(x)

    class _ResNetV2(nn.Module):
        def __init__(self, layers=(3, 4, 9), channels=(256, 512, 1024),
                     stem_w=64, groups=32):
            super().__init__()
            self.stem = nn.Sequential(OrderedDict([
                ("conv", StdConv2dSame(3, stem_w, 7, 2)),
                ("norm", GroupNormAct(stem_w, groups)),
                ("pool", MaxPool2dSame()),
            ]))
            stages, cin = [], stem_w
            for i, (n, cout) in enumerate(zip(layers, channels)):
                stages.append(_RNStage(cin, cout, n, 1 if i == 0 else 2, groups))
                cin = cout
            self.stages = nn.Sequential(*stages)

        def forward(self, x):
            return self.stages(self.stem(x))

    class _HybridEmbed(nn.Module):
        def __init__(self, backbone, feat_dim, embed_dim):
            super().__init__()
            self.backbone = backbone
            self.proj = nn.Conv2d(feat_dim, embed_dim, 1)

        def forward(self, x):
            return self.proj(self.backbone(x)).flatten(2).transpose(1, 2)

    class _Attn(nn.Module):
        def __init__(self, dim, heads):
            super().__init__()
            self.num_heads = heads
            self.qkv = nn.Linear(dim, dim * 3, bias=True)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            b, n, c = x.shape
            h = self.num_heads
            qkv = self.qkv(x).reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            a = (q @ k.transpose(-2, -1)) * (c // h) ** -0.5
            a = a.softmax(dim=-1)
            return self.proj((a @ v).transpose(1, 2).reshape(b, n, c))

    class _Mlp(nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = nn.Linear(dim, hidden)
            self.act = nn.GELU()
            self.fc2 = nn.Linear(hidden, dim)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class _ViTBlock(nn.Module):
        def __init__(self, dim, heads, mlp):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim, eps=1e-6)
            self.attn = _Attn(dim, heads)
            self.norm2 = nn.LayerNorm(dim, eps=1e-6)
            self.mlp = _Mlp(dim, mlp)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class _HybridViT(nn.Module):
        def __init__(self, depth=12, dim=768, heads=12, mlp=3072, grid=24):
            super().__init__()
            self.patch_embed = _HybridEmbed(_ResNetV2(), 1024, dim)
            self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
            self.pos_embed = nn.Parameter(torch.zeros(1, grid * grid + 1, dim))
            self.pos_drop = nn.Dropout(0.0)
            self.blocks = nn.Sequential(*[
                _ViTBlock(dim, heads, mlp) for _ in range(depth)])
            self.norm = nn.LayerNorm(dim, eps=1e-6)
            trunc_normal_(self.pos_embed, std=0.02)
            trunc_normal_(self.cls_token, std=0.02)

    def create_model(name, pretrained=False, **kw):
        if name in ("vit_base_resnet50_384", "vit_base_r50_s16_384"):
            return _HybridViT()
        raise ValueError(f"timm shim: unknown model {name}")

    timm.create_model = create_model

    # ---- fvcore.nn.weight_init
    fv = mod("fvcore")
    fvnn = mod("fvcore.nn")
    wi = mod("fvcore.nn.weight_init")

    def c2_xavier_fill(m):
        nn.init.kaiming_uniform_(m.weight, a=1)
        if getattr(m, "bias", None) is not None:
            nn.init.constant_(m.bias, 0)

    def c2_msra_fill(m):
        nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")
        if getattr(m, "bias", None) is not None:
            nn.init.constant_(m.bias, 0)

    wi.c2_xavier_fill = c2_xavier_fill
    wi.c2_msra_fill = c2_msra_fill
    fv.nn = fvnn
    fvnn.weight_init = wi

    # ---- detectron2
    d2 = mod("detectron2")
    d2_utils = mod("detectron2.utils")
    d2_fileio = mod("detectron2.utils.file_io")
    d2_fileio.PathManager = object()
    d2_modeling = mod("detectron2.modeling")
    d2_layers = mod("detectron2.layers")
    d2_structures = mod("detectron2.structures")

    class _Registry:
        def register(self, *a, **k):
            def deco(cls):
                return cls
            if a and callable(a[0]):
                return a[0]
            return deco

    class ShapeSpec:
        def __init__(self, channels=None, height=None, width=None, stride=None):
            self.channels = channels
            self.height = height
            self.width = width
            self.stride = stride

    class Conv2d(nn.Conv2d):
        """detectron2 Conv2d: fused optional norm + activation."""

        def __init__(self, *args, **kwargs):
            norm = kwargs.pop("norm", None)
            activation = kwargs.pop("activation", None)
            super().__init__(*args, **kwargs)
            self.norm = norm
            self.activation = activation

        def forward(self, x):
            x = super().forward(x)
            if self.norm is not None:
                x = self.norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x

    def get_norm(norm, out_channels):
        if norm == "" or norm is None:
            return None
        if norm == "GN":
            return nn.GroupNorm(32, out_channels)
        raise ValueError(norm)

    class ImageList:
        def __init__(self, tensor, image_sizes):
            self.tensor = tensor
            self.image_sizes = image_sizes

        @staticmethod
        def from_tensors(tensors, size_divisibility=0):
            import torch as th

            return ImageList(th.stack(list(tensors)), [t.shape[-2:] for t in tensors])

    # ---- omegaconf (configurable decorator probes DictConfig)
    oc = mod("omegaconf")

    class DictConfig(dict):
        pass

    oc.DictConfig = DictConfig
    oc.OmegaConf = types.SimpleNamespace(create=lambda *a, **k: DictConfig(*a))

    # ---- torchvision (only box_area & version attr are touched)
    tv = mod("torchvision")
    tv_ops = mod("torchvision.ops")
    tv_boxes = mod("torchvision.ops.boxes")

    def box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    tv_boxes.box_area = box_area
    tv_ops.boxes = tv_boxes
    tv.ops = tv_ops
    tv.__version__ = "0.0-shim"

    d2_modeling.BACKBONE_REGISTRY = _Registry()
    d2_modeling.Backbone = nn.Module
    d2_modeling.ShapeSpec = ShapeSpec
    d2_layers.Conv2d = Conv2d
    d2_layers.ShapeSpec = ShapeSpec
    d2_layers.get_norm = get_norm
    d2_layers.DeformConv = nn.Conv2d  # unused path
    d2_layers.cat = lambda tensors, dim=0: torch.cat(tensors, dim)
    d2_layers.shapes_to_tensor = lambda x, device=None: torch.as_tensor(x, device=device)
    d2_layers.batched_nms = lambda boxes, scores, idxs, thr: torch.arange(len(scores))
    d2_layers.nonzero_tuple = lambda x: torch.nonzero(x, as_tuple=True)
    d2_layers.move_device_like = lambda src, dst: src
    d2_layers.interpolate = F.interpolate
    d2_layers.ConvTranspose2d = nn.ConvTranspose2d
    d2_layers.BatchNorm2d = nn.BatchNorm2d
    d2_layers.Linear = nn.Linear
    class Instances:
        def __init__(self, image_size, **kwargs):
            self._image_size = image_size
            for k, v in kwargs.items():
                setattr(self, k, v)

    class Boxes:
        def __init__(self, tensor):
            self.tensor = tensor

    class BitMasks:
        def __init__(self, tensor):
            self.tensor = tensor

        def get_bounding_boxes(self):
            return Boxes(torch.zeros(self.tensor.shape[0], 4))

    d2_structures.ImageList = ImageList
    d2_structures.Instances = Instances
    d2_structures.Boxes = Boxes
    d2_structures.BitMasks = BitMasks
    d2_structures.ROIMasks = BitMasks
    d2_structures.PolygonMasks = BitMasks

    d2_data = mod("detectron2.data")

    class _Metadata:
        def get(self, name, default=None):
            return default

    d2_data.MetadataCatalog = types.SimpleNamespace(get=lambda name: _Metadata())
    d2.data = d2_data
    d2_utils_mem = mod("detectron2.utils.memory")
    d2_utils_mem.retry_if_cuda_oom = lambda f: f
    d2_utils.memory = d2_utils_mem
    d2_utils_vis = mod("detectron2.utils.visualizer")
    d2_utils_vis.Visualizer = object
    d2_utils_vis.ColorMode = types.SimpleNamespace(IMAGE=0, SEGMENTATION=1)
    d2_utils.visualizer = d2_utils_vis
    d2_proj = mod("detectron2.projects")
    d2_proj_pc = mod("detectron2.projects.point_rend")
    d2.projects = d2_proj
    d2.utils = d2_utils
    d2.modeling = d2_modeling
    d2.layers = d2_layers
    d2.structures = d2_structures


def install_i2vgen():
    """Stubs for the i2vgen-xl UNet imports (xformers, rotary embeddings,
    fairscale checkpointing, open_clip, the repo's Registry). The xformers
    stub computes real attention so parity tests exercise identical math."""
    import types

    import torch
    import torch.nn as nn

    import importlib.machinery

    def mod(name):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        sys.modules[name] = m
        return m

    xf = mod("xformers")
    xf_ops = mod("xformers.ops")

    def memory_efficient_attention(q, k, v, attn_bias=None, op=None):
        # q/k/v: [B*, N, D] (or [B, N, H, D]); default scale 1/sqrt(D)
        scale = q.shape[-1] ** -0.5
        sim = torch.einsum("...nd,...md->...nm", q * scale, k)
        if attn_bias is not None:  # callers pass None or LowerTriangularMask()
            n = sim.shape[-1]
            tri = torch.full((n, n), float("-inf")).triu(1)
            sim = sim + tri
        return torch.einsum("...nm,...md->...nd", sim.softmax(dim=-1), v)

    xf_ops.memory_efficient_attention = memory_efficient_attention
    xf_ops.LowerTriangularMask = lambda: 1
    xf.ops = xf_ops

    rot = mod("rotary_embedding_torch")

    class RotaryEmbedding:
        def __init__(self, dim):
            self.dim = dim

        def rotate_queries_or_keys(self, x):
            return x

    rot.RotaryEmbedding = RotaryEmbedding

    fs = mod("fairscale")
    fs_nn = mod("fairscale.nn")
    fs_ckpt = mod("fairscale.nn.checkpoint")
    fs_ckpt.checkpoint_wrapper = lambda m: m
    fs_nn.checkpoint = fs_ckpt
    fs.nn = fs_nn

    mod("open_clip")

    # `from utils.registry_class import MODEL` inside the vendored tree
    utils_pkg = mod("utils")
    reg = mod("utils.registry_class")

    class _Registry:
        def register_class(self):
            def deco(cls):
                return cls
            return deco

    for name in ("MODEL", "EMBEDDER", "AUTO_ENCODER", "DIFFUSION", "DATASETS",
                 "PRETRAIN", "VISUAL", "EMBEDMANAGER", "DISTRIBUTION",
                 "ENGINE", "INFER_ENGINE"):
        setattr(reg, name, _Registry())
    utils_pkg.registry_class = reg

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

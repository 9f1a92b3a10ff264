"""Import the /root/reference torch modules with lightweight dependency shims.

The reference tree (DiverGen / BSGAL / vendored detectron2+CenterNet2) depends
on packages absent from this image (timm, fvcore, yacs, iopath, omegaconf,
torchvision, pycocotools, lvis, cv2-adjacent helpers).  For numeric-parity
tests we only need the *model math* (nn.Module forwards and loss functions),
so this module installs minimal-but-correct shims into ``sys.modules`` before
putting the reference packages on ``sys.path``.

Shim policy: anything a parity test actually *executes* (DropPath eval,
trunc_normal_, giou/smooth-l1 losses, weight inits, torchvision nms/roi_align)
is implemented for real in torch; anything only touched at import time
(config plumbing, registries, PathManager) is an inert stand-in.

PUBLIC UNTRUSTED CONTENT NOTE: the reference is studied for behavior only.
"""
from __future__ import annotations

import math
import sys
import types

REF = "/root/reference"
D2_ROOT = f"{REF}/BSGAL/third_party/CenterNet2"
CN2_ROOT = f"{REF}/BSGAL/third_party/CenterNet2/projects/CenterNet2"


def _mod(name: str) -> types.ModuleType:
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
        if "." in name:
            parent, child = name.rsplit(".", 1)
            setattr(_mod(parent), child, m)
    return m


def _install_timm():
    import torch
    import torch.nn as nn

    layers = _mod("timm.models.layers")
    _mod("timm.models")
    _mod("timm")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    class DropPath(nn.Module):
        """Stochastic depth (per-sample). Identity in eval / p=0."""

        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = float(drop_prob or 0.0)

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype, device=x.device))
            return x / keep * mask

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm = sys.modules["timm"]
    timm.models = sys.modules["timm.models"]
    sys.modules["timm.models"].layers = layers

    def create_model(*a, **k):
        raise NotImplementedError("timm shim: create_model unused in parity tests")

    timm.create_model = create_model
    helpers = _mod("timm.models.helpers")
    helpers.build_model_with_cfg = create_model
    registry = _mod("timm.models.registry")
    registry.register_model = lambda fn: fn
    resnet = _mod("timm.models.resnet")

    class ResNet(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()
            raise NotImplementedError("timm shim: ResNet unused in parity tests")

    class Bottleneck(nn.Module):
        expansion = 4

    resnet.ResNet = ResNet
    resnet.Bottleneck = Bottleneck
    resnet.default_cfgs = {}
    timm.models.helpers = helpers
    timm.models.registry = registry
    timm.models.resnet = resnet


def _install_yacs():
    m = _mod("yacs.config")
    _mod("yacs")

    class CfgNode(dict):
        """Attribute-access dict; enough for fvcore/detectron2 subclasses."""

        IMMUTABLE = "__immutable__"

        def __init__(self, init_dict=None, key_list=None, new_allowed=False):
            super().__init__()
            for k, v in (init_dict or {}).items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

        def clone(self):
            import copy

            return copy.deepcopy(self)

        def merge_from_other_cfg(self, other):
            for k, v in other.items():
                self[k] = v

        def freeze(self):
            pass

        def defrost(self):
            pass

        def is_frozen(self):
            return False

        @classmethod
        def load_cfg(cls, *a, **k):
            raise NotImplementedError

    m.CfgNode = CfgNode
    sys.modules["yacs"].config = m


def _install_fvcore():
    import torch
    import torch.nn as nn

    _mod("fvcore").__version__ = "0.1.6"
    fnn = _mod("fvcore.nn")

    def smooth_l1_loss(input, target, beta: float, reduction: str = "none"):
        if beta < 1e-5:
            loss = torch.abs(input - target)
        else:
            n = torch.abs(input - target)
            cond = n < beta
            loss = torch.where(cond, 0.5 * n**2 / beta, n - 0.5 * beta)
        if reduction == "mean":
            return loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
        if reduction == "sum":
            return loss.sum()
        return loss

    def giou_loss(boxes1, boxes2, reduction: str = "none", eps: float = 1e-7):
        x1, y1, x2, y2 = boxes1.unbind(dim=-1)
        x1g, y1g, x2g, y2g = boxes2.unbind(dim=-1)
        xkis1 = torch.max(x1, x1g)
        ykis1 = torch.max(y1, y1g)
        xkis2 = torch.min(x2, x2g)
        ykis2 = torch.min(y2, y2g)
        intsctk = torch.zeros_like(x1)
        mask = (ykis2 > ykis1) & (xkis2 > xkis1)
        intsctk[mask] = (xkis2[mask] - xkis1[mask]) * (ykis2[mask] - ykis1[mask])
        unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
        iouk = intsctk / (unionk + eps)
        xc1 = torch.min(x1, x1g)
        yc1 = torch.min(y1, y1g)
        xc2 = torch.max(x2, x2g)
        yc2 = torch.max(y2, y2g)
        area_c = (xc2 - xc1) * (yc2 - yc1)
        miouk = iouk - ((area_c - unionk) / (area_c + eps))
        loss = 1 - miouk
        if reduction == "mean":
            return loss.mean() if loss.numel() > 0 else 0.0 * loss.sum()
        if reduction == "sum":
            return loss.sum()
        return loss

    def sigmoid_focal_loss_jit(inputs, targets, alpha=-1, gamma=2, reduction="none"):
        p = torch.sigmoid(inputs)
        ce = nn.functional.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce * ((1 - p_t) ** gamma)
        if alpha >= 0:
            alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
            loss = alpha_t * loss
        if reduction == "mean":
            return loss.mean()
        if reduction == "sum":
            return loss.sum()
        return loss

    fnn.smooth_l1_loss = smooth_l1_loss
    fnn.giou_loss = giou_loss
    fnn.sigmoid_focal_loss_jit = sigmoid_focal_loss_jit

    dist = _mod("fvcore.nn.distributed")
    dist.differentiable_all_reduce = lambda x: x
    fnn.distributed = dist

    pbn = _mod("fvcore.nn.precise_bn")
    pbn.get_bn_modules = lambda model: []
    pbn.update_bn_stats = lambda *a, **k: None
    fnn.precise_bn = pbn

    fl = _mod("fvcore.nn.focal_loss")
    fl.sigmoid_focal_loss_jit = fnn.sigmoid_focal_loss_jit
    fl.sigmoid_focal_loss = fnn.sigmoid_focal_loss_jit
    fnn.focal_loss = fl

    # parameter/flop counters only used by analysis tooling
    for name in ("parameter_count", "parameter_count_table", "flop_count",
                 "activation_count", "FlopCountAnalysis"):
        setattr(fnn, name, lambda *a, **k: {})

    wi = _mod("fvcore.nn.weight_init")

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out", nonlinearity="relu")
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    wi.c2_xavier_fill = c2_xavier_fill
    wi.c2_msra_fill = c2_msra_fill
    fnn.weight_init = wi

    common = _mod("fvcore.common")
    cfg_mod = _mod("fvcore.common.config")
    from yacs.config import CfgNode as _YCN  # our shim

    class CfgNode(_YCN):
        @classmethod
        def load_yaml_with_base(cls, filename, allow_unsafe=False):
            raise NotImplementedError

        def merge_from_file(self, *a, **k):
            raise NotImplementedError

        def merge_from_list(self, cfg_list):
            for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
                node = self
                parts = k.split(".")
                for p in parts[:-1]:
                    node = node[p]
                node[parts[-1]] = v
            return self

    cfg_mod.CfgNode = CfgNode
    common.config = cfg_mod

    checkpoint = _mod("fvcore.common.checkpoint")

    class Checkpointer:
        def __init__(self, model, save_dir="", *, save_to_disk=None, **extra):
            self.model = model
            self.save_dir = save_dir
            self.checkpointables = extra

        def save(self, *a, **k):
            raise NotImplementedError

        def load(self, *a, **k):
            raise NotImplementedError

    class PeriodicCheckpointer:
        def __init__(self, *a, **k):
            pass

    checkpoint.Checkpointer = Checkpointer
    checkpoint.PeriodicCheckpointer = PeriodicCheckpointer
    checkpoint._IncompatibleKeys = tuple
    common.checkpoint = checkpoint

    timer = _mod("fvcore.common.timer")
    import time as _time

    class Timer:
        def __init__(self):
            self.reset()

        def reset(self):
            self._start = _time.perf_counter()
            self._paused = None
            self._total = 0.0

        def pause(self):
            self._paused = _time.perf_counter()

        def resume(self):
            if self._paused is not None:
                self._start += _time.perf_counter() - self._paused
                self._paused = None

        def seconds(self):
            end = self._paused if self._paused is not None else _time.perf_counter()
            return self._total + (end - self._start)

    timer.Timer = Timer
    common.timer = timer

    hist = _mod("fvcore.common.history_buffer")

    class HistoryBuffer:
        def __init__(self, max_length: int = 1000000):
            self._data = []
            self._count = 0
            self._global_avg = 0.0

        def update(self, value, iteration=None):
            if iteration is None:
                iteration = self._count
            self._data.append((value, iteration))
            self._count += 1
            self._global_avg += (value - self._global_avg) / self._count

        def latest(self):
            return self._data[-1][0]

        def median(self, window_size: int):
            import numpy as np

            return float(np.median([x[0] for x in self._data[-window_size:]]))

        def avg(self, window_size: int):
            import numpy as np

            return float(np.mean([x[0] for x in self._data[-window_size:]]))

        def global_avg(self):
            return self._global_avg

        def values(self):
            return self._data

    hist.HistoryBuffer = HistoryBuffer
    common.history_buffer = hist

    ps = _mod("fvcore.common.param_scheduler")

    class ParamScheduler:
        pass

    class CosineParamScheduler(ParamScheduler):
        def __init__(self, start_value, end_value):
            self._start = start_value
            self._end = end_value

        def __call__(self, where):
            return self._end + 0.5 * (self._start - self._end) * (
                1 + math.cos(math.pi * where)
            )

    class MultiStepParamScheduler(ParamScheduler):
        def __init__(self, values, milestones=None, num_updates=None):
            self._values = values
            self._milestones = milestones

    class LinearParamScheduler(ParamScheduler):
        def __init__(self, start_value, end_value):
            self._start = start_value
            self._end = end_value

        def __call__(self, where):
            return self._start + (self._end - self._start) * where

    class CompositeParamScheduler(ParamScheduler):
        def __init__(self, schedulers, lengths, interval_scaling):
            self._schedulers = schedulers
            self._lengths = lengths

    class ConstantParamScheduler(ParamScheduler):
        def __init__(self, value):
            self._value = value

        def __call__(self, where):
            return self._value

    class StepWithFixedGammaParamScheduler(ParamScheduler):
        def __init__(self, *a, **k):
            pass

    class ExponentialParamScheduler(ParamScheduler):
        def __init__(self, *a, **k):
            pass

    class PolynomialDecayParamScheduler(ParamScheduler):
        def __init__(self, *a, **k):
            pass

    for n, c in list(locals().items()):
        if isinstance(c, type) and issubclass(c, ParamScheduler):
            setattr(ps, n, c)
    ps.ParamScheduler = ParamScheduler
    common.param_scheduler = ps

    registry = _mod("fvcore.common.registry")

    class Registry:
        def __init__(self, name):
            self._name = name
            self._obj_map = {}

        def register(self, obj=None):
            if obj is None:
                def deco(cls):
                    self._obj_map[cls.__name__] = cls
                    return cls

                return deco
            self._obj_map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._obj_map[name]

        def __contains__(self, name):
            return name in self._obj_map

        def __iter__(self):
            return iter(self._obj_map.items())

    registry.Registry = Registry
    common.registry = registry

    # ---- fvcore.transforms (import-time only for model-parity tests) ----
    tr = _mod("fvcore.transforms.transform")
    _mod("fvcore.transforms")
    import numpy as _np

    class Transform:
        def _set_attributes(self, params=None):
            if params:
                for k, v in params.items():
                    if k != "self" and not k.startswith("_"):
                        setattr(self, k, v)

        def apply_image(self, img):
            raise NotImplementedError

        def apply_coords(self, coords):
            raise NotImplementedError

        def apply_box(self, box):
            idxs = _np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
            coords = _np.asarray(box).reshape(-1, 4)[:, idxs].reshape(-1, 2)
            coords = self.apply_coords(coords).reshape((-1, 4, 2))
            minxy = coords.min(axis=1)
            maxxy = coords.max(axis=1)
            return _np.concatenate((minxy, maxxy), axis=1)

        def apply_segmentation(self, segmentation):
            return self.apply_image(segmentation)

        def apply_polygons(self, polygons):
            return [self.apply_coords(p) for p in polygons]

        @classmethod
        def register_type(cls, data_type, func=None):
            if func is None:
                def wrapper(f):
                    setattr(cls, "apply_" + data_type, f)
                    return f

                return wrapper
            setattr(cls, "apply_" + data_type, func)

        def inverse(self):
            raise NotImplementedError

    class TransformList(Transform):
        def __init__(self, transforms):
            super().__init__()
            tfms = []
            for t in transforms:
                if isinstance(t, TransformList):
                    tfms.extend(t.transforms)
                else:
                    tfms.append(t)
            self.transforms = tfms

        def _apply(self, x, meth):
            for t in self.transforms:
                x = getattr(t, meth)(x)
            return x

        def __getattribute__(self, name):
            if name.startswith("apply_"):
                return lambda x: self._apply(x, name)
            return super().__getattribute__(name)

        def __add__(self, other):
            others = other.transforms if isinstance(other, TransformList) else [other]
            return TransformList(self.transforms + others)

        def __iadd__(self, other):
            others = other.transforms if isinstance(other, TransformList) else [other]
            self.transforms.extend(others)
            return self

        def __len__(self):
            return len(self.transforms)

        def __getitem__(self, idx):
            return self.transforms[idx]

        def inverse(self):
            return TransformList([t.inverse() for t in self.transforms[::-1]])

    class NoOpTransform(Transform):
        def apply_image(self, img):
            return img

        def apply_coords(self, coords):
            return coords

        def inverse(self):
            return self

        def __getattr__(self, name):
            if name.startswith("apply_"):
                return lambda x: x
            raise AttributeError(name)

    class HFlipTransform(Transform):
        def __init__(self, width):
            self._set_attributes(locals())

        def apply_image(self, img):
            return _np.flip(img, axis=1)

        def apply_coords(self, coords):
            coords = _np.asarray(coords).copy()
            coords[:, 0] = self.width - coords[:, 0]
            return coords

        def inverse(self):
            return self

    class VFlipTransform(Transform):
        def __init__(self, height):
            self._set_attributes(locals())

        def apply_image(self, img):
            return _np.flip(img, axis=0)

        def apply_coords(self, coords):
            coords = _np.asarray(coords).copy()
            coords[:, 1] = self.height - coords[:, 1]
            return coords

        def inverse(self):
            return self

    class CropTransform(Transform):
        def __init__(self, x0, y0, w, h, orig_w=None, orig_h=None):
            self._set_attributes(locals())

        def apply_image(self, img):
            return img[self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w]

        def apply_coords(self, coords):
            coords = _np.asarray(coords).copy()
            coords[:, 0] -= self.x0
            coords[:, 1] -= self.y0
            return coords

    class BlendTransform(Transform):
        def __init__(self, src_image, src_weight, dst_weight):
            self._set_attributes(locals())

        def apply_image(self, img):
            return (self.src_weight * self.src_image + self.dst_weight * img).astype(
                img.dtype
            )

        def apply_coords(self, coords):
            return coords

        def inverse(self):
            return NoOpTransform()

    class PadTransform(Transform):
        def __init__(self, x0, y0, x1, y1, orig_w=None, orig_h=None, pad_value=0,
                     seg_pad_value=0):
            self._set_attributes(locals())

        def apply_image(self, img):
            pad = ((self.y0, self.y1), (self.x0, self.x1)) + ((0, 0),) * (img.ndim - 2)
            return _np.pad(img, pad, constant_values=self.pad_value)

        def apply_coords(self, coords):
            coords = _np.asarray(coords).copy()
            coords[:, 0] += self.x0
            coords[:, 1] += self.y0
            return coords

    class ScaleTransform(Transform):
        def __init__(self, h, w, new_h, new_w, interp=None):
            self._set_attributes(locals())

        def apply_image(self, img):
            return img

        def apply_coords(self, coords):
            coords = _np.asarray(coords).copy()
            coords[:, 0] *= self.new_w / self.w
            coords[:, 1] *= self.new_h / self.h
            return coords

    class GridSampleTransform(Transform):
        def __init__(self, *a, **k):
            pass

    for c in (Transform, TransformList, NoOpTransform, HFlipTransform,
              VFlipTransform, CropTransform, BlendTransform, PadTransform,
              ScaleTransform, GridSampleTransform):
        setattr(tr, c.__name__, c)
        setattr(sys.modules["fvcore.transforms"], c.__name__, c)
    sys.modules["fvcore.transforms"].transform = tr

    filemod = _mod("fvcore.common.file_io")

    class PathManager:
        @staticmethod
        def open(path, mode="r", **kw):
            return open(path, mode, **kw)

        @staticmethod
        def exists(path):
            import os

            return os.path.exists(path)

        @staticmethod
        def get_local_path(path, **kw):
            return path

        @staticmethod
        def isfile(path):
            import os

            return os.path.isfile(path)

        @staticmethod
        def mkdirs(path):
            import os

            os.makedirs(path, exist_ok=True)

        @staticmethod
        def ls(path):
            import os

            return os.listdir(path)

        @staticmethod
        def register_handler(*a, **k):
            pass

    filemod.PathManager = PathManager
    common.file_io = filemod


def _install_iopath():
    _mod("iopath")
    com = _mod("iopath.common")
    fio = _mod("iopath.common.file_io")
    from fvcore.common.file_io import PathManager as _PM  # our shim

    class PathManager(_PM):
        def __init__(self):
            pass

        # instance methods delegate to the static shims
        def open(self, path, mode="r", **kw):  # type: ignore[override]
            buffering = kw.pop("buffering", -1)
            return open(path, mode, buffering=buffering if buffering != -1 else -1, **kw)

    class PathHandler:
        pass

    class HTTPURLHandler(PathHandler):
        pass

    class OneDrivePathHandler(PathHandler):
        pass

    class NativePathHandler(PathHandler):
        pass

    def file_lock(path):
        import contextlib

        return contextlib.nullcontext()

    fio.PathManager = PathManager
    fio.PathManagerFactory = types.SimpleNamespace(get=lambda *a, **k: PathManager())
    fio.PathHandler = PathHandler
    fio.HTTPURLHandler = HTTPURLHandler
    fio.OneDrivePathHandler = OneDrivePathHandler
    fio.NativePathHandler = NativePathHandler
    fio.file_lock = file_lock
    fio.g_pathmgr = PathManager()
    com.file_io = fio


def _install_torchvision():
    import torch

    tv = _mod("torchvision")
    ops = _mod("torchvision.ops")
    boxes_mod = _mod("torchvision.ops.boxes")
    # parseable by d2's `int(x) for x in __version__.split(".")[:2]`
    # (roi_align.py:45 picks the aligned=True native path for >= (0, 7))
    tv.__version__ = "0.15.0"

    def nms(boxes, scores, iou_threshold):
        """Exact greedy NMS, pure torch (reference torchvision semantics)."""
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.int64, device=boxes.device)
        x1, y1, x2, y2 = boxes.unbind(dim=1)
        areas = (x2 - x1) * (y2 - y1)
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0].item()
            keep.append(i)
            if order.numel() == 1:
                break
            rest = order[1:]
            xx1 = torch.max(x1[i], x1[rest])
            yy1 = torch.max(y1[i], y1[rest])
            xx2 = torch.min(x2[i], x2[rest])
            yy2 = torch.min(y2[i], y2[rest])
            w = (xx2 - xx1).clamp(min=0)
            h = (yy2 - yy1).clamp(min=0)
            inter = w * h
            iou = inter / (areas[i] + areas[rest] - inter)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.int64, device=boxes.device)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.int64, device=boxes.device)
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
        boxes_for_nms = boxes + offsets[:, None]
        return nms(boxes_for_nms, scores, iou_threshold)

    def roi_align(input, boxes, output_size, spatial_scale=1.0, sampling_ratio=-1,
                  aligned=False):
        """Reference bilinear ROIAlign in pure torch (NCHW)."""
        if isinstance(boxes, (list, tuple)):
            concat = []
            for b_idx, b in enumerate(boxes):
                idx = torch.full((b.shape[0], 1), b_idx, dtype=b.dtype, device=b.device)
                concat.append(torch.cat([idx, b], dim=1))
            rois = torch.cat(concat, dim=0)
        else:
            rois = boxes
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        ph, pw = output_size
        n, c, h, w = input.shape
        out = input.new_zeros((rois.shape[0], c, ph, pw))
        offset = 0.5 if aligned else 0.0
        for r in range(rois.shape[0]):
            b_idx = int(rois[r, 0].item())
            x1 = rois[r, 1].item() * spatial_scale - offset
            y1 = rois[r, 2].item() * spatial_scale - offset
            x2 = rois[r, 3].item() * spatial_scale - offset
            y2 = rois[r, 4].item() * spatial_scale - offset
            rw = x2 - x1
            rh = y2 - y1
            if not aligned:
                rw = max(rw, 1.0)
                rh = max(rh, 1.0)
            bh = rh / ph
            bw = rw / pw
            sr_h = sampling_ratio if sampling_ratio > 0 else max(1, math.ceil(rh / ph))
            sr_w = sampling_ratio if sampling_ratio > 0 else max(1, math.ceil(rw / pw))
            fmap = input[b_idx]
            for iy in range(ph):
                for ix in range(pw):
                    acc = fmap.new_zeros((c,))
                    for sy in range(sr_h):
                        for sx in range(sr_w):
                            y = y1 + iy * bh + (sy + 0.5) * bh / sr_h
                            x = x1 + ix * bw + (sx + 0.5) * bw / sr_w
                            if y < -1.0 or y > h or x < -1.0 or x > w:
                                continue
                            y_ = min(max(y, 0.0), h - 1)
                            x_ = min(max(x, 0.0), w - 1)
                            y0 = int(math.floor(y_))
                            x0 = int(math.floor(x_))
                            y1i = min(y0 + 1, h - 1)
                            x1i = min(x0 + 1, w - 1)
                            ly = y_ - y0
                            lx = x_ - x0
                            acc = acc + (
                                fmap[:, y0, x0] * (1 - ly) * (1 - lx)
                                + fmap[:, y0, x1i] * (1 - ly) * lx
                                + fmap[:, y1i, x0] * ly * (1 - lx)
                                + fmap[:, y1i, x1i] * ly * lx
                            )
                    out[r, :, iy, ix] = acc / (sr_h * sr_w)
        return out

    def deform_conv2d(*a, **k):
        raise NotImplementedError("torchvision shim: deform_conv2d unused in parity tests")

    class RoIPool(torch.nn.Module):
        def __init__(self, output_size, spatial_scale):
            super().__init__()
            self.output_size = output_size
            self.spatial_scale = spatial_scale

        def forward(self, *a, **k):
            raise NotImplementedError("torchvision shim: RoIPool unused")

    ops.nms = nms
    ops.batched_nms = batched_nms
    ops.roi_align = roi_align
    ops.deform_conv2d = deform_conv2d
    ops.RoIPool = RoIPool
    boxes_mod.nms = nms
    boxes_mod.batched_nms = batched_nms
    ops.boxes = boxes_mod
    tv.ops = ops

    # torchvision.models for timm-style references that don't run in tests
    _mod("torchvision.models")


def _install_misc():
    # pycocotools / lvis / cv2-opt are touched at import time by evaluators
    # and dataset code we don't exercise; inert stubs keep imports alive.
    coco = _mod("pycocotools")
    m = _mod("pycocotools.mask")

    def _unavail(*a, **k):
        raise NotImplementedError("pycocotools shim: not available in parity tests")

    m.encode = _unavail
    m.decode = _unavail
    m.area = _unavail
    m.toBbox = _unavail
    m.frPyObjects = _unavail
    cocomod = _mod("pycocotools.coco")

    class COCO:
        def __init__(self, *a, **k):
            raise NotImplementedError

    cocomod.COCO = COCO
    cocoeval = _mod("pycocotools.cocoeval")

    class COCOeval:
        def __init__(self, *a, **k):
            raise NotImplementedError

    cocoeval.COCOeval = COCOeval
    coco.mask = m
    coco.coco = cocomod
    coco.cocoeval = cocoeval

    lvis = _mod("lvis")

    class _LVISUnavailable:
        def __init__(self, *a, **k):
            raise NotImplementedError

    lvis.LVIS = _LVISUnavailable
    lvis.LVISResults = _LVISUnavailable
    lvis.LVISEval = _LVISUnavailable

    # clip.simple_tokenizer: back the reference's tokenizer with our own
    # from-scratch BPE implementation (merges=[] → byte-level fallback; the
    # real vocab file isn't in the image). Parity tests feed token ids
    # directly, so only the encoder dict + encode() surface matters.
    clip_pkg = _mod("clip")
    st = _mod("clip.simple_tokenizer")
    import os as _os

    _repo_root = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    if _repo_root not in sys.path:
        sys.path.insert(0, _repo_root)
    from divergen_tpu.modeling.text.tokenizer import SimpleTokenizer as _OurTok

    class SimpleTokenizer(_OurTok):
        def __init__(self, bpe_path=None):
            super().__init__(bpe_path=None, merges=[])

    st.SimpleTokenizer = SimpleTokenizer
    clip_pkg.simple_tokenizer = st

    om = _mod("omegaconf")

    class DictConfig(dict):
        def __init__(self, content=None, flags=None):
            super().__init__(content or {})

    class ListConfig(list):
        pass

    class OmegaConf:
        @staticmethod
        def create(x=None, flags=None):
            return DictConfig(x or {})

        @staticmethod
        def to_container(x, resolve=False):
            return dict(x)

        @staticmethod
        def merge(*a):
            out = DictConfig()
            for d in a:
                out.update(d)
            return out

    om.DictConfig = DictConfig
    om.ListConfig = ListConfig
    om.OmegaConf = OmegaConf
    om.SCMode = types.SimpleNamespace(DICT="dict", INSTANTIATE="instantiate")

    # cloudpickle exists in the image; psutil may not
    try:
        import psutil  # noqa: F401
    except ImportError:
        ps = _mod("psutil")
        ps.virtual_memory = lambda: types.SimpleNamespace(available=1 << 33)


_installed = False


def _install_d2_native_stub():
    """detectron2._C (the compiled CUDA/C++ extension): any op raises."""

    class _CModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)

            def _unavailable(*a, **k):
                raise NotImplementedError(
                    f"detectron2._C.{name}: native extension not built in parity env"
                )

            return _unavailable

    sys.modules["detectron2._C"] = _CModule("detectron2._C")


def install() -> None:
    global _installed
    if _installed:
        return
    # Pillow>=10 removed the old resampling aliases the reference uses
    from PIL import Image as _Image

    for old, new in (("LINEAR", "BILINEAR"), ("CUBIC", "BICUBIC"),
                     ("ANTIALIAS", "LANCZOS")):
        if not hasattr(_Image, old):
            setattr(_Image, old, getattr(_Image, new))

    _install_d2_native_stub()
    _install_timm()
    _install_yacs()
    _install_fvcore()
    _install_iopath()
    _install_torchvision()
    _install_misc()
    for p in (D2_ROOT, CN2_ROOT, f"{REF}/DiverGen", f"{REF}/BSGAL"):
        if p not in sys.path:
            sys.path.insert(0, p)
    _installed = True


def load_swin():
    """Reference SwinTransformer class (DiverGen swintransformer.py:28-749)."""
    install()
    from divergen.modeling.backbone.swintransformer import SwinTransformer

    return SwinTransformer

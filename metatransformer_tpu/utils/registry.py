"""Model/component registry + config-driven builder.

Equivalent of openpoints' ``MODELS.register_module()`` /
``build_model_from_cfg`` (``PointCloud/openpoints/models/build.py``,
``registry.py``) and pcdet's name-dispatched ``build_network``: components
register under a name; configs instantiate by NAME + kwargs.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Callable] = {}

    def register(self, name: Optional[str] = None):
        def deco(fn):
            key = name or fn.__name__
            if key in self._entries:
                raise KeyError(f"{key!r} already registered in {self.name}")
            self._entries[key] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable:
        if name not in self._entries:
            raise KeyError(
                f"{name!r} not in registry {self.name}; "
                f"known: {sorted(self._entries)}"
            )
        return self._entries[name]

    def build(self, cfg: Dict[str, Any], **extra):
        """cfg: {"NAME": ..., **kwargs} (openpoints convention)."""
        cfg = dict(cfg)
        name = cfg.pop("NAME", None) or cfg.pop("name")
        return self.get(name)(**cfg, **extra)

    def __contains__(self, name: str) -> bool:
        return name in self._entries


MODELS = Registry("models")
TOKENIZERS = Registry("tokenizers")
HEADS = Registry("heads")


def _register_builtins() -> None:
    """Register the shipped model families by name."""
    import types

    from metatransformer_tpu.models import (
        audio_classifier,
        caddn,
        centerpoint,
        graph_predictor,
        hyper_classifier,
        iassd,
        image_classifier,
        mask_rcnn,
        part_a2,
        point_classifier,
        point_multiview,
        point_rcnn,
        point_segmenter,
        pv_rcnn,
        pv_rcnn_pp,
        second,
        second_iou,
        segmentor,
        tabular_classifier,
        time_series,
        video_classifier,
        voxel_rcnn,
    )

    pairs = {
        "ImageClassifier": image_classifier,
        "AudioClassifier": audio_classifier,
        "VideoClassifier": video_classifier,
        "PointClassifier": point_classifier,
        "PointSegmenter": point_segmenter,
        "HyperClassifier": hyper_classifier,
        "TabularClassifier": tabular_classifier,
        "GraphPredictor": graph_predictor,
        "TimeSeriesModel": time_series,
        "Segmentor": segmentor,  # ViT-Adapter + UperNet
        "SECONDNet": second,  # sparse-voxel 3D detector
        "CenterPoint": centerpoint,  # anchor-free center-heatmap detector
        "VoxelRCNN": voxel_rcnn,  # two-stage sparse-voxel detector
        "PVRCNN": pv_rcnn,  # point-voxel two-stage detector
        "PointRCNN": point_rcnn,  # point-based two-stage detector
        "IASSD": iassd,  # instance-aware single-stage point detector
        "SECONDNetIoU": second_iou,  # SECOND + IoU confidence head (SSL workhorse)
        "PartA2Net": part_a2,  # part-aware two-stage detector (sparse UNet)
        "PVRCNNPlusPlus": pv_rcnn_pp,  # SPC keypoints + VectorPool aggregation
        "CaDDN": caddn,  # monocular camera detector (categorical depth)
        "MetaTransformerMultiView": point_multiview,
        "MaskRCNN": types.SimpleNamespace(
            init=mask_rcnn.init,
            forward=mask_rcnn.forward_test,
            forward_train=mask_rcnn.forward_train,
            Config=mask_rcnn.MaskRCNNConfig,
        ),
        "Mask2FormerSegmentor": types.SimpleNamespace(
            init=segmentor.init_mask2former,
            forward=segmentor.forward_mask2former,
            Config=segmentor.Mask2FormerSegmentorConfig,
        ),
    }
    from metatransformer_tpu.models import htc, mdf_detectors

    pairs["HTC"] = types.SimpleNamespace(  # interleaved cascade (htc++)
        init=htc.init,
        forward=htc.forward_test,
        forward_train=htc.forward_train,
        Config=htc.HTCConfig,
    )
    pairs["MDFSECONDNet"] = types.SimpleNamespace(  # multi-dataset fusion
        init=mdf_detectors.init,
        forward=mdf_detectors.forward,
        Config=mdf_detectors.MDFSECONDConfig,
    )
    pairs["MDFCenterPoint"] = types.SimpleNamespace(
        init=mdf_detectors.init_centerpoint,
        forward=mdf_detectors.forward_centerpoint,
        Config=mdf_detectors.MDFCenterPointConfig,
    )
    for name, mod in pairs.items():
        if name not in MODELS:
            MODELS._entries[name] = mod


_register_builtins()

"""Default segmentation backend for object-shaped mask synthesis.

The reference's SegmentationMask hard-depends on detectron2's PanopticFPN R101
(`evaluation/masks/mask.py:7-14,358-407`); detectron2 has no TPU story. The
TPU-native default instead reuses the in-repo ADE20k SegmentationModule
(`models/aux/segmentation.py`, the same net the ResNetPL loss and
segmentation-aware metrics already use) and derives pseudo-panoptic instances
from its semantic label map: connected components over 'thing' classes
(Stuff == 0 in the vendored object150_info.csv).

Interface contract (what SegmentationMask expects of a predictor):
    img (H, W, C) float [0, 1] -> (panoptic_seg (H, W) int array,
                                   segments_info: [{'id', 'isthing'}, ...])
"""
import csv
import logging
import os
from typing import Optional

import cv2
import numpy as np

LOGGER = logging.getLogger(__name__)

_RESOURCES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          'resources')


def ade20k_thing_class_ids() -> frozenset:
    """0-based ADE20k class indices that are 'things' (instance-like)."""
    with open(os.path.join(_RESOURCES, 'object150_info.csv')) as f:
        return frozenset(int(row['Idx']) - 1 for row in csv.DictReader(f)
                         if int(row['Stuff']) == 0)


class ADE20kPanopticPredictor:
    """Semantic ADE20k labels -> pseudo-panoptic segments via per-class
    connected components. Lazily builds the SegmentationModule (weights from
    `weights_path` or $TORCH_HOME; random weights allowed for smoke tests —
    placements are then arbitrary but the pipeline is exercised)."""

    def __init__(self, weights_path: Optional[str] = None,
                 segmentation_module=None, min_instance_area: float = 1e-3,
                 arch_encoder: str = 'resnet50dilated',
                 allow_random_weights: bool = False):
        self._module = segmentation_module
        self.weights_path = weights_path if weights_path is not None \
            else os.environ.get('TORCH_HOME')
        self.min_instance_area = min_instance_area
        self.arch_encoder = arch_encoder
        self.allow_random_weights = allow_random_weights
        self.thing_ids = ade20k_thing_class_ids()

    @property
    def module(self):
        if self._module is None:
            # loud-fail policy (same as losses/perceptual.py ResNetPL): object
            # placements from a randomly-initialised segmenter are arbitrary,
            # so require real weights (BOTH encoder and decoder) unless the
            # caller explicitly opts out
            from ..models.aux.segmentation import resolve_ade20k_weight_paths
            enc, _ = resolve_ade20k_weight_paths(self.weights_path,
                                                 self.arch_encoder)
            if enc is None and not self.allow_random_weights:
                raise RuntimeError(
                    f'ADE20k segmenter weights not found under '
                    f'{self.weights_path!r} (set $TORCH_HOME or weights_path; '
                    'see fetch_data/). Object-shaped masks from RANDOM weights '
                    'are arbitrary — pass allow_random_weights=True to the '
                    'predictor only for pipeline smoke tests.')
            from ..models.aux.segmentation import SegmentationModule
            self._module = SegmentationModule(weights_path=self.weights_path,
                                              arch_encoder=self.arch_encoder)
        return self._module

    def __call__(self, img):
        img = np.asarray(img, dtype=np.float32)
        if img.max() > 1.5:  # uint8-scaled input
            img = img / 255.0
        labels, _ = self.module.predict(img[None])
        labels = np.asarray(labels[0])

        panoptic = np.zeros(labels.shape, dtype=np.int32)
        segments_info = []
        next_id = 1
        min_px = self.min_instance_area * labels.size
        for cls in np.unique(labels):
            cls_mask = labels == cls
            if int(cls) not in self.thing_ids:
                panoptic[cls_mask] = next_id
                segments_info.append({'id': next_id, 'isthing': False,
                                      'category_id': int(cls)})
                next_id += 1
                continue
            n, comps = cv2.connectedComponents(cls_mask.astype(np.uint8),
                                               connectivity=8)
            for comp_i in range(1, n):
                comp_mask = comps == comp_i
                if comp_mask.sum() < min_px:
                    continue
                panoptic[comp_mask] = next_id
                segments_info.append({'id': next_id, 'isthing': True,
                                      'category_id': int(cls)})
                next_id += 1
        return panoptic, segments_info


def make_default_predictor(**kwargs) -> ADE20kPanopticPredictor:
    return ADE20kPanopticPredictor(**kwargs)

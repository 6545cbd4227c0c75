"""SyntheticHuman(++) dataset: GT albedo/normal + per-frame relighting HDRIs.

Equivalent of `datasets/synthetichuman.py` (taconite/IntrinsicAvatar): like
PeopleSnapshot but additionally loads ground-truth albedo (linear RGB) and
world-space normal maps for quantitative inverse-rendering evaluation, a
dilated-bbox ``valid_mask`` for metrics, and a per-frame ``hdri_files.json``
mapping for relighting evaluation.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

from intrinsicavatar_tpu.data import register
from intrinsicavatar_tpu.data.peoplesnapshot import PeopleSnapshotDataset


class _GtExtrasMixin:
    """Adds GT albedo/normal/valid_mask/hdri loading on top of the base
    image loader."""

    def _load_extras(self, idx, datum, flat_shape, sel_indices=None):
        import cv2

        if getattr(self, "albedo_lists", None):
            alb = cv2.cvtColor(cv2.imread(self.albedo_lists[idx],
                                          cv2.IMREAD_ANYDEPTH
                                          | cv2.IMREAD_COLOR),
                               cv2.COLOR_BGR2RGB).astype(np.float32)
            if alb.dtype == np.uint8 or alb.max() > 2.0:
                alb = alb / 255.0
            alb = alb.reshape(-1, 3)
            datum["albedo"] = alb[sel_indices] if sel_indices is not None \
                else alb
        if getattr(self, "normal_lists", None):
            nrm = cv2.cvtColor(cv2.imread(self.normal_lists[idx]),
                               cv2.COLOR_BGR2RGB).astype(np.float32)
            nrm = nrm / 255.0 * 2.0 - 1.0
            nrm = nrm.reshape(-1, 3)
            datum["normal"] = nrm[sel_indices] if sel_indices is not None \
                else nrm
        if getattr(self, "hdri_map", None) and self.mode == "test":
            name = self.hdri_map.get(str(idx)) or self.hdri_map.get(
                os.path.basename(self.img_lists[idx]))
            if name:
                hdri = cv2.cvtColor(
                    cv2.imread(os.path.join(self.root, "hdri", name),
                               cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR),
                    cv2.COLOR_BGR2RGB)
                datum["hdri"] = hdri.astype(np.float32)
        return datum

    def _init_extras(self, start, end, skip):
        self.albedo_lists = sorted(
            glob.glob(f"{self.root}/albedo/*.png")
            + glob.glob(f"{self.root}/albedo/*.exr"))[start:end:skip]
        self.normal_lists = sorted(
            glob.glob(f"{self.root}/normal/*.png"))[start:end:skip]
        hdri_json = os.path.join(self.root, "hdri_files.json")
        self.hdri_map = None
        if os.path.exists(hdri_json):
            with open(hdri_json) as f:
                self.hdri_map = json.load(f)


@register("synthetichuman")
class SyntheticHumanDataset(_GtExtrasMixin, PeopleSnapshotDataset):
    def __init__(self, config, split="train", mode="train", rng=None):
        super().__init__(config, split=split, mode=mode, rng=rng)
        opt = config.get("opt", {}).get(mode if mode != "val" else "val", {})
        self._init_extras(opt.get("start", 0), opt.get("end", 0) + 1,
                          opt.get("skip", 1))

    def __getitem__(self, idx):
        datum = super().__getitem__(idx)
        if self.mode != "train":
            datum = self._load_extras(idx, datum, None)
            # metric bbox from the dilated mask
            import cv2
            msk = np.load(self.msk_lists[idx]).astype(np.uint8)
            m = cv2.dilate(msk, np.ones((16, 16), np.uint8))
            ys, xs = np.where(m > 0)
            valid = np.zeros(m.shape, bool)
            if len(ys):
                valid[ys.min():ys.max() + 1, xs.min():xs.max() + 1] = True
            datum["valid_mask"] = valid.reshape(-1)
        return datum


@register("rana")
class RanaDataset(SyntheticHumanDataset):
    """RANA synthetic benchmark: same extras (GT albedo/normal + per-frame
    HDRIs) with novel-pose relighting; pose correction is typically enabled
    (`datasets/rana.py` in the reference)."""

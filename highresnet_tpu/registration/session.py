"""Headless registration session — the GUI's engine without the GUI.

Everything the reference PyQt5 app does (registration_app.py:37-1252)
except pixel-pushing widgets: load a reference/template pair, nudge or
solve sub-pixel shifts with any search method, accumulate shift deltas,
track metric histories (ML1E / PL / SSIM / NMI / NCC), build overlay
images (red-cyan, checkerboard, difference, ...), and vote the best shift
across metrics. A thin Qt front-end can wrap this class; the class itself
is fully scriptable and tested headlessly.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from highresnet_tpu.registration import metrics as rm
from highresnet_tpu.registration import search as rs
from highresnet_tpu.utils.display import compute_sum_of_layers, contrast_stretch_8bit
from highresnet_tpu.utils.imageio import imread_u16

OVERLAY_MODES = (
    "Red-Cyan",
    "Template Only",
    "Reference Only",
    "Blend",
    "Difference",
    "Checkerboard",
    "Masked Difference",
    "Template Mask",
    "Reference Mask",
)

SEARCH_METHODS = (
    "Fourier",
    "Point Matching",
    "NCC",
    "Perceptual Loss",
    "SSIM",
    "Mutual Information",
    "Mean L1 Error",
)


class RegistrationSession:
    def __init__(self, config: Optional[dict] = None, perceptual_model=None):
        from highresnet_tpu.config import DEFAULT_REGISTRATION_CONFIG

        self.config = dict(DEFAULT_REGISTRATION_CONFIG)
        if config:
            self.config.update(config)
        self.ref_image: Optional[np.ndarray] = None
        self.ref_mask: Optional[np.ndarray] = None
        self.template_image: Optional[np.ndarray] = None
        self.template_mask: Optional[np.ndarray] = None
        self._perceptual_model = perceptual_model
        self.reset_history()

    # -- loading ---------------------------------------------------------

    def load_reference(self, image_path: str, mask_path: Optional[str] = None):
        self.ref_image = np.asarray(imread_u16(image_path), np.float32)
        self.ref_mask = (
            (imread_u16(mask_path) > 0).astype(np.float32)
            if mask_path
            else np.ones_like(self.ref_image)
        )

    def load_template(self, image_path: str, mask_path: Optional[str] = None):
        self.template_image = np.asarray(imread_u16(image_path), np.float32)
        self.template_mask = (
            (imread_u16(mask_path) > 0).astype(np.float32)
            if mask_path
            else np.ones_like(self.template_image)
        )

    def set_arrays(self, ref, template, ref_mask=None, template_mask=None):
        self.ref_image = np.asarray(ref, np.float32)
        self.template_image = np.asarray(template, np.float32)
        self.ref_mask = (
            np.ones_like(self.ref_image) if ref_mask is None else np.asarray(ref_mask, np.float32)
        )
        self.template_mask = (
            np.ones_like(self.template_image)
            if template_mask is None
            else np.asarray(template_mask, np.float32)
        )

    # -- shift state -------------------------------------------------------

    @property
    def current_shift(self) -> Tuple[float, float]:
        return self.config["current_deltay"], self.config["current_deltax"]

    def nudge(self, dy: float = 0.0, dx: float = 0.0):
        """Arrow-key-style incremental nudging (uses config step sizes)."""
        self.config["current_deltay"] += dy
        self.config["current_deltax"] += dx

    def shifted_template(self) -> Tuple[np.ndarray, np.ndarray]:
        dy, dx = self.current_shift
        if dy == 0.0 and dx == 0.0:
            return self.template_image, self.template_mask
        img, msk = rs.apply_shift_to_template(dx, dy, self.template_image, self.template_mask)
        return img, (msk > 0.5).astype(np.float32)

    # -- solve -------------------------------------------------------------

    def compute_and_apply_shift(self, method: str = "NCC", **kwargs) -> Tuple[float, float]:
        """Estimate the residual shift with `method`, accumulate it into the
        session deltas, and record metric history. Returns the new totals."""
        img, msk = self.shifted_template()
        if method == "Fourier":
            dyx = rs.compute_shift_pcc(self.ref_image, img, self.ref_mask, msk)
        elif method == "Point Matching":
            dyx = rs.compute_shift_point_matching(self.ref_image, img, **kwargs)
        elif method == "NCC":
            dyx = rs.compute_shift_ncc(self.ref_image, img, self.ref_mask, msk, **kwargs)
        elif method == "Perceptual Loss":
            dyx = rs.compute_shift_pl(
                self._require_model(), self.ref_image, img, self.ref_mask, msk, **kwargs
            )
        elif method == "SSIM":
            dyx = rs.compute_shift_with_metric(
                rm.masked_ssim, minimize=False, ref_image=self.ref_image, template_image=img,
                ref_mask=self.ref_mask, template_mask=msk, **kwargs,
            )
        elif method == "Mutual Information":
            dyx = rs.compute_shift_with_metric(
                rm.masked_mi, minimize=False, ref_image=self.ref_image, template_image=img,
                ref_mask=self.ref_mask, template_mask=msk, **kwargs,
            )
        elif method == "Mean L1 Error":
            dyx = rs.compute_shift_with_metric(
                rm.masked_ml1e, minimize=True, ref_image=self.ref_image, template_image=img,
                ref_mask=self.ref_mask, template_mask=msk, **kwargs,
            )
        else:
            raise ValueError(f"unknown method {method!r}; choose from {SEARCH_METHODS}")

        self.config["current_deltay"] += float(dyx[0])
        self.config["current_deltax"] += float(dyx[1])
        self.record_metrics()
        return self.current_shift

    def _require_model(self):
        if self._perceptual_model is None:
            from highresnet_tpu.models.vgg import VGGFeatureExtractor

            self._perceptual_model = VGGFeatureExtractor()
        return self._perceptual_model

    # -- metric histories + voting -----------------------------------------

    def reset_history(self):
        self.history: Dict[str, List[float]] = {
            "shift_y": [], "shift_x": [], "ml1e": [], "pl": [],
            "ssim": [], "nmi": [], "ncc": [],
        }
        self.last_diff_features: Optional[dict] = None

    def record_metrics(self):
        """Evaluate all metrics at the current shift and append to history."""
        img, msk = self.shifted_template()
        dy, dx = self.current_shift
        pl, diffs = rm.perceptual_loss(
            self.ref_image, img, self.ref_mask, msk, self._require_model()
        )
        self.last_diff_features = diffs
        self.history["shift_y"].append(dy)
        self.history["shift_x"].append(dx)
        self.history["ml1e"].append(float(rm.masked_ml1e(self.ref_image, img, self.ref_mask, msk)))
        self.history["pl"].append(pl)
        self.history["ssim"].append(float(rm.masked_ssim(self.ref_image, img, self.ref_mask, msk)))
        self.history["nmi"].append(float(rm.masked_mi(self.ref_image, img, self.ref_mask, msk)))
        self.history["ncc"].append(float(rm.masked_ncc(self.ref_image, img, self.ref_mask, msk)))

    def vote_best_shift(self) -> Tuple[float, float]:
        """Multi-metric vote (reference: apply_best_shift,
        registration_app.py:886-942): each metric votes for the history
        index where it was best (ML1E/PL minimize; SSIM/NMI/NCC maximize);
        the plurality index's shift becomes the current shift."""
        if not self.history["pl"]:
            raise RuntimeError("no shifts recorded yet")
        votes: Dict[int, int] = {}
        for key, best_fn in [
            ("ml1e", np.argmin), ("pl", np.argmin),
            ("ssim", np.argmax), ("nmi", np.argmax), ("ncc", np.argmax),
        ]:
            idx = int(best_fn(self.history[key]))
            votes[idx] = votes.get(idx, 0) + 1
        winner = max(votes.items(), key=lambda kv: kv[1])[0]
        self.config["current_deltay"] = self.history["shift_y"][winner]
        self.config["current_deltax"] = self.history["shift_x"][winner]
        return self.current_shift

    # -- overlays ------------------------------------------------------------

    def overlay(self, mode: str = "Red-Cyan", checker: int = 32) -> np.ndarray:
        """Build an 8-bit visualization of the current alignment state."""
        img, msk = self.shifted_template()
        ref8 = contrast_stretch_8bit(self.ref_image)
        tpl8 = contrast_stretch_8bit(img, msk)
        if mode == "Red-Cyan":
            out = np.zeros((*ref8.shape, 3), np.uint8)
            out[..., 0] = tpl8
            out[..., 1] = ref8
            out[..., 2] = ref8
            return out
        if mode == "Template Only":
            return tpl8
        if mode == "Reference Only":
            return ref8
        if mode == "Blend":
            return ((ref8.astype(np.uint16) + tpl8.astype(np.uint16)) // 2).astype(np.uint8)
        if mode == "Difference":
            return np.abs(ref8.astype(np.int16) - tpl8.astype(np.int16)).astype(np.uint8)
        if mode == "Masked Difference":
            d = np.abs(ref8.astype(np.int16) - tpl8.astype(np.int16)).astype(np.uint8)
            return (d * (self.ref_mask * msk)).astype(np.uint8)
        if mode == "Checkerboard":
            yy, xx = np.indices(ref8.shape)
            board = ((yy // checker + xx // checker) % 2).astype(bool)
            out = ref8.copy()
            out[board] = tpl8[board]
            return out
        if mode == "Template Mask":
            return (msk * 255).astype(np.uint8)
        if mode == "Reference Mask":
            return (self.ref_mask * 255).astype(np.uint8)
        raise ValueError(f"unknown overlay mode {mode!r}; choose from {OVERLAY_MODES}")

    def vgg_diff_heatmap(self) -> np.ndarray:
        """Summed normalized VGG |diff| heatmap at the current shift."""
        if self.last_diff_features is None:
            self.record_metrics()
        return compute_sum_of_layers(self.last_diff_features)

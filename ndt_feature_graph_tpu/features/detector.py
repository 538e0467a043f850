"""Multi-scale curvature interest-point detector.

TPU-native re-design of flirtlib's CurvatureDetector +
SimpleMinMaxPeakFinder stack (flirtlib_ros/src/flirtlib.cpp:41-51;
canonical parameters at ndt_feature/include/ndt_feature/
flirtlib_utils.h:15-35: 5 scales, base sigma 0.2, step 1.4, peak finder
0.34/0.001).

The reference computes graph-geodesic Gaussian smoothing over a
distance-MST of the scan polyline — inherently sequential.  Here each
scale smooths the polyline with a fixed-width Gaussian over *arc
length* approximated in beam-index space, computes the turning-angle
curvature response at a scale-proportional span, and peak-finds
local maxima — all fixed-shape (S, B) tensor ops, batchable over scans
via vmap.  Occlusion boundaries are suppressed with a range-jump gate
(flirtlib handles this by polyline segmentation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ndt_feature_graph_tpu.config import FeatureParams


class FeatureSet(NamedTuple):
    """Padded interest points in the SENSOR frame."""

    pts: jnp.ndarray        # (F, 2)
    angles: jnp.ndarray     # (F,) orientation
    scales: jnp.ndarray     # (F,) detection scale (sigma)
    response: jnp.ndarray   # (F,) detector response
    mask: jnp.ndarray       # (F,) bool

    def transform(self, pose):
        from ndt_feature_graph_tpu.core import se2

        pts = se2.transform_points(pose, self.pts)
        angles = self.angles + pose[..., 2]
        return self._replace(pts=pts, angles=angles)


def _gaussian_kernel(sigma_bins: float, half: int):
    x = np.arange(-half, half + 1)
    k = np.exp(-0.5 * (x / max(sigma_bins, 1e-3)) ** 2)
    return jnp.asarray(k / k.sum(), jnp.float32)


def _smooth_1d(x, kernel):
    """'same' Gaussian convolution of a 1D signal with edge padding."""
    pad = (kernel.shape[0] - 1) // 2
    xp = jnp.pad(x, (pad, pad), mode="edge")
    return jnp.convolve(xp, kernel, mode="valid")


def detect(params: FeatureParams, ranges, hit) -> FeatureSet:
    """Detect up to `max_features` interest points in one scan.

    ranges: (B,), hit: (B,) bool.  Returns a padded FeatureSet.
    """
    b = params.num_beams
    angles = jnp.linspace(-np.pi, np.pi, b, endpoint=False)
    pts = jnp.stack(
        [ranges * jnp.cos(angles), ranges * jnp.sin(angles)], -1
    )

    # Occlusion/jump gate: big range discontinuities are not geometry.
    jump = jnp.abs(jnp.diff(ranges, prepend=ranges[:1])) > 0.5
    jump = jump | jnp.roll(jump, -1)

    responses = []
    scale_sigmas = []
    for i in range(params.num_scales):
        sigma = params.base_sigma * params.sigma_step**i
        # Convert sigma (metres of arc) to beams using the median arc
        # step at ~5 m range (2*pi*5/B per beam).
        arc_per_beam = 2.0 * np.pi * 5.0 / b
        sigma_bins = sigma / arc_per_beam
        half = int(min(max(2, np.ceil(3 * sigma_bins)), 40))
        kern = _gaussian_kernel(sigma_bins, half)
        sx = _smooth_1d(pts[:, 0], kern)
        sy = _smooth_1d(pts[:, 1], kern)

        # Turning angle at span k ~ sigma_bins.
        k = int(min(max(1, round(sigma_bins)), 30))
        fx = jnp.roll(sx, -k) - sx
        fy = jnp.roll(sy, -k) - sy
        bx = sx - jnp.roll(sx, k)
        by = sy - jnp.roll(sy, k)
        dot = fx * bx + fy * by
        cross = bx * fy - by * fx
        curv = jnp.abs(jnp.arctan2(cross, dot + 1e-12))

        ok = (
            hit
            & jnp.roll(hit, k)
            & jnp.roll(hit, -k)
            & ~jump
            & ~jnp.roll(jump, k)
            & ~jnp.roll(jump, -k)
        )
        responses.append(jnp.where(ok, curv, 0.0))
        scale_sigmas.append(sigma)

    resp = jnp.stack(responses)                     # (S, B)

    # Peak finding per scale (SimpleMinMaxPeakFinder semantics: strict
    # local maximum with minimum prominence and absolute threshold).
    left = jnp.roll(resp, 1, axis=-1)
    right = jnp.roll(resp, -1, axis=-1)
    is_peak = (
        (resp > left + params.peak_min_diff)
        & (resp > right + params.peak_min_diff)
        & (resp > params.peak_min_value)
    )
    peak_resp = jnp.where(is_peak, resp, 0.0)

    # Non-maximum suppression across scales: keep the best scale per
    # beam, then global top-K beams.
    best_scale = jnp.argmax(peak_resp, axis=0)       # (B,)
    best_resp = jnp.max(peak_resp, axis=0)           # (B,)

    f = params.max_features
    top_resp, top_idx = jax.lax.top_k(best_resp, f)
    valid = top_resp > 0.0

    sigmas = jnp.asarray(scale_sigmas, jnp.float32)
    sel_scale = sigmas[best_scale[top_idx]]
    sel_pts = pts[top_idx]

    # Orientation: normal of the local tangent (pointing toward sensor,
    # like flirtlib's normal-based orientation).
    tangent = jnp.roll(pts, -2, axis=0) - jnp.roll(pts, 2, axis=0)
    normal_angle = jnp.arctan2(tangent[:, 0], -tangent[:, 1])
    # Flip normals to face the sensor.
    to_sensor = -sel_pts
    na = normal_angle[top_idx]
    nvec = jnp.stack([jnp.cos(na), jnp.sin(na)], -1)
    flip = jnp.sum(nvec * to_sensor, -1) < 0
    na = jnp.where(flip, na + np.pi, na)

    return FeatureSet(
        pts=sel_pts,
        angles=jnp.arctan2(jnp.sin(na), jnp.cos(na)),
        scales=sel_scale,
        response=top_resp,
        mask=valid,
    )

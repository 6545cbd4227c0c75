"""Serial NumPy oracles for the resampling ops.

These re-state, in plain Python, the per-ray serial-scan *semantics* of the
reference CUDA kernels (`lib/nerfacc/cuda/csrc/cdf.cu`) so the vectorized JAX
implementations in ``intrinsicavatar_tpu.ops.resample`` can be tested against
an independently-written spec.
"""

import numpy as np

BG_OFFSET = 10000.0


def uniform_bins(n_bins):
    if n_bins == 1:
        return np.array([0.5])
    step = (1.0 - 1.0 / n_bins) / (n_bins - 1)
    return 1.0 / (2.0 * n_bins) + np.arange(n_bins) * step


def cdf_resample_ray(t_starts, t_ends, weights, sdfs, n_bins):
    """Oracle for cdf_resampling_kernel (cdf.cu:10-148). Valid entries only."""
    steps = len(weights)
    ts = np.zeros(n_bins)
    offsets = np.zeros(n_bins)
    indices = np.zeros(n_bins, np.int64)
    is_bg = np.zeros(n_bins, bool)
    fg_counts = np.zeros(steps, np.int32)
    bg_count = 0
    surface_idx = -1

    wsum = weights.sum()
    wsum += max(1.0 - wsum, 0.0)
    us = uniform_bins(n_bins)

    idx, j = 0, 0
    cdf_prev, cdf_next = 0.0, weights[0] / wsum
    sdf_prev = sdfs[0]
    sdf_next = sdfs[1] if steps > 1 else 0.0
    found_surface = False
    while j < n_bins and idx < steps:
        u = us[j]
        if u < cdf_next:
            scaling = (t_ends[idx] - t_starts[idx]) / (cdf_next - cdf_prev)
            offset = (u - cdf_prev) * scaling
            t = offset + t_starts[idx]
            if sdf_prev >= 0 and sdf_next < 0 and not found_surface:
                frac = offset / (t_ends[idx] - t_starts[idx])
                sdf_approx = sdf_prev + (sdf_next - sdf_prev) * frac
                ts[j] = t if sdf_approx >= 0 else (ts[j - 1] if j > 0 else t_starts[idx])
            elif found_surface:
                ts[j] = ts[j - 1] if j > 0 else t_starts[idx]
            else:
                ts[j] = t
            offsets[j] = offset
            indices[j] = idx
            fg_counts[idx] += 1
            j += 1
        elif idx < steps - 1:
            idx += 1
            if sdf_prev >= 0 and sdf_next < 0 and not found_surface:
                surface_idx = idx - 1
                found_surface = True
            sdf_prev = sdfs[idx]
            sdf_next = sdfs[idx + 1] if idx < steps - 1 else 0.0
            cdf_prev = cdf_next
            cdf_next += weights[idx] / wsum
        else:
            break
    while j < n_bins:
        ts[j] = BG_OFFSET + t_ends[steps - 1]
        offsets[j] = BG_OFFSET
        indices[j] = steps - 1
        is_bg[j] = True
        bg_count += 1
        j += 1
    return ts, offsets, indices, is_bg, fg_counts, bg_count, surface_idx


def merge_resample_ray(vals, is_left, is_right, weights, n_new):
    """Oracle for cdf_resampling_merge_kernel (cdf.cu:218-333).

    Returns merged (vals, is_left, is_right, is_new) lists of length
    steps + #placed.
    """
    steps = len(vals)
    wsum = 0.0
    for j in range(steps - 1):
        if is_left[j] and is_right[j + 1]:
            wsum += weights[j]
    wsum += max(1.0 - wsum, 0.0)

    us = uniform_bins(n_new)
    out_vals, out_left, out_right, out_new = [], [], [], []

    idx, j = 0, 0
    start, end = vals[0], vals[1] if steps > 1 else vals[0]
    cdf_prev, cdf_next = 0.0, weights[0] / wsum
    out_vals.append(vals[0])
    out_left.append(True)
    out_right.append(bool(is_right[0]))
    out_new.append(False)
    while j < n_new and idx < steps - 1:
        u = us[j]
        if u < cdf_next:
            scaling = (end - start) / (cdf_next - cdf_prev)
            t = (u - cdf_prev) * scaling + start
            j += 1
            out_vals.append(t)
            out_left.append(True)
            out_right.append(True)
            out_new.append(True)
        else:
            idx += 1
            out_vals.append(vals[idx])
            out_right.append(bool(is_right[idx]))
            out_new.append(False)
            if idx >= steps - 1:
                out_left.append(bool(is_left[idx]))
                break
            start, end = vals[idx], vals[idx + 1]
            if is_left[idx] and is_right[idx + 1]:
                cdf_prev = cdf_next
                cdf_next += weights[idx] / wsum
                out_left.append(True)
            else:
                out_left.append(False)
    while idx < steps - 1:
        idx += 1
        out_vals.append(vals[idx])
        out_right.append(bool(is_right[idx]))
        out_new.append(False)
        if idx >= steps - 1:
            out_left.append(bool(is_left[idx]))
            break
        if is_left[idx] and is_right[idx + 1]:
            out_left.append(True)
        else:
            out_left.append(False)
    return (np.array(out_vals), np.array(out_left), np.array(out_right),
            np.array(out_new))


def fine_resample_ray(t_starts, t_ends, weights, n_samples):
    """Oracle for cdf_resampling_fine_kernel (cdf.cu:404-534)."""
    steps = len(weights)
    nb = n_samples + 1
    wsum = weights.sum()
    wsum += max(1.0 - wsum, 0.0)
    us = uniform_bins(nb)

    rs = np.zeros(n_samples)
    re = np.zeros(n_samples)
    fg = np.zeros(n_samples, bool)
    idx, j = 0, 0
    cdf_prev, cdf_next = 0.0, weights[0] / wsum
    while j < nb and idx < steps:
        if us[j] < cdf_next:
            scaling = (t_ends[idx] - t_starts[idx]) / (cdf_next - cdf_prev)
            t = (us[j] - cdf_prev) * scaling + t_starts[idx]
            if j < nb - 1:
                rs[j] = t
            if j > 0:
                re[j - 1] = t
                fg[j - 1] = True
            j += 1
        else:
            idx += 1
            if idx >= steps:
                break
            cdf_prev = cdf_next
            cdf_next += weights[idx] / wsum
    return rs, re, fg


def sdf_fine_resample_ray(t_starts, t_ends, alphas, sdfs, n_samples):
    """Oracle for cdf_resampling_sdf_fine_kernel (cdf.cu:537-638)."""
    steps = len(alphas)
    nb = n_samples + 1
    rs = np.zeros(n_samples)
    re = np.zeros(n_samples)
    fg = np.zeros(n_samples, bool)

    idx = 0
    sdf_prev = sdfs[0]
    found = False
    while idx < steps:
        idx += 1
        if idx >= steps:
            break
        if sdf_prev >= 0 and sdfs[idx] < 0 and not found:
            idx -= 1
            found = True
            break
        sdf_prev = sdfs[idx]
    if not found:
        return rs, re, fg

    us = uniform_bins(nb)
    j = 0
    trans = 1.0
    weight = alphas[idx]
    trans *= 1.0 - alphas[idx]
    cdf_prev, cdf_next = 0.0, weight
    while j < nb and idx < steps:
        if us[j] < cdf_next:
            scaling = (t_ends[idx] - t_starts[idx]) / (cdf_next - cdf_prev)
            t = (us[j] - cdf_prev) * scaling + t_starts[idx]
            if j < nb - 1:
                rs[j] = t
            if j > 0:
                re[j - 1] = t
                fg[j - 1] = True
            j += 1
        else:
            idx += 1
            if idx >= steps:
                break
            weight = trans * alphas[idx]
            trans *= 1.0 - alphas[idx]
            cdf_prev = cdf_next
            cdf_next += weight
    return rs, re, fg

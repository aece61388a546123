"""Independent torch-CPU oracle implementing the reference merge semantics.

This is a from-the-spec reimplementation of the numerical contract documented
in SURVEY.md §2.2 (reference shard/tensor/functions.py), used to cross-check
the JAX implementation against a second, torch-based realization — including
the reference's quirks (cutoff masks both testing |Re v1|; disagreement lanes
of the arithmetic blend always taking v1).

Kept deliberately separate from the package: the framework itself has zero
torch dependency.
"""

import torch


def slerp(v0, v1, t):
    dot = torch.sum(v0 * v1) / (v0.norm() * v1.norm())
    dot = torch.clamp(dot, -1.0, 1.0)
    theta = torch.acos(dot) * t
    rel = v1 - v0 * dot
    rel = torch.nn.functional.normalize(rel, dim=-1)
    return v0 * torch.cos(theta) + rel * torch.sin(theta)


def fft_transform(x):
    x = x.to(torch.float32)
    if x.ndim == 1:
        return torch.fft.fft(x)
    return torch.fft.fftn(x, dim=(-2, -1))


def ifft_transform(x):
    if x.ndim == 1:
        return torch.fft.ifft(x).real
    return torch.fft.ifftn(x, dim=(-2, -1)).real


def normalize_tensor(x):
    norm = x.norm().item()
    return (x / norm if norm != 0 else x), norm


def interpolate_fft_components(
    v0_fft, v1_fft, t, t_sum=1.0, cutoff_pct=0.0, cull_pct=0.0, interp_imag=True
):
    result = torch.zeros_like(v0_fft)
    r0 = v0_fft.real.clone()
    r1 = v1_fft.real.clone()
    a0 = r0.abs()
    a1 = r1.abs()

    if cutoff_pct > 0:
        all_real, _ = torch.sort(torch.cat([a0, a1]).ravel(), descending=False)
        idx = int(len(all_real) * cutoff_pct)
        cutoff_threshold = all_real[min(idx, len(all_real) - 1)].item()
    else:
        cutoff_threshold = 0

    sign_mask = r0.sign() == r1.sign()
    small = a1 < cutoff_threshold  # quirk: |Re v1| on both masks
    slerp_mask = sign_mask & ~small
    sum_mask = sign_mask & ~slerp_mask
    rest_mask = ~slerp_mask & ~sum_mask
    larger = a0 > a1

    real = result.real.clone()
    real[slerp_mask] = slerp(r0[slerp_mask], r1[slerp_mask], t)
    real[sum_mask] = r0[sum_mask] + t_sum * r1[sum_mask]
    real[rest_mask] = torch.where(larger[rest_mask], r0[rest_mask], r1[rest_mask])

    if cull_pct > 0:
        all_real, _ = torch.sort(real.abs().ravel(), descending=False)
        cull_idx = int(len(all_real) * cull_pct)
        cull_threshold = all_real[cull_idx].item()
        if (all_real < cull_threshold).sum() > (len(all_real) * (cull_pct * 2)):
            pass  # overflow guard: skip cull
        else:
            real[real.abs() < cull_threshold] = 0

    result.real = real

    if interp_imag:
        i0 = fft_transform(v0_fft.imag)
        i1 = fft_transform(v1_fft.imag)
        inner = interpolate_fft_components(
            i0, i1, t=t, cutoff_pct=0, cull_pct=0, interp_imag=False
        )
        result.imag = ifft_transform(inner)
    else:
        result.imag = v0_fft.imag

    return result


def arithmetic_fft_components(v0_fft, v1_fft, t, agreement, do_imag=True):
    result = torch.zeros_like(v0_fft)
    if agreement:
        sign_mask = v0_fft.real.sign() == v1_fft.real.sign()
    else:
        sign_mask = torch.ones_like(v0_fft.real, dtype=torch.bool)
    real = result.real.clone()
    real[sign_mask] = v0_fft.real[sign_mask] + t * v1_fft.real[sign_mask]
    # quirk: disagreement lanes always take v1
    real[~sign_mask] = v1_fft.real[~sign_mask]
    result.real = real
    if do_imag:
        i0 = fft_transform(v0_fft.imag)
        i1 = fft_transform(v1_fft.imag)
        inner = arithmetic_fft_components(i0, i1, t, agreement, do_imag=False)
        result.imag = ifft_transform(inner)
    else:
        result.imag = v0_fft.imag
    return result


def task_arithmetic_fft2(v0, v1, t, agreement=True):
    return ifft_transform(
        arithmetic_fft_components(fft_transform(v0), fft_transform(v1), t, agreement)
    )


def merge_tensors_fft2_slerp(
    v0, v1, t, b=0.1, t_sum=1.0, cutoff_pct=0.0, cull_pct=0.0
):
    v0, norm_v0 = normalize_tensor(v0)
    v1, norm_v1 = normalize_tensor(v1)
    if norm_v1 < 1e-4 or norm_v0 < 1e-4:
        return v0, norm_v0, norm_v1
    fft_v0 = fft_transform(v0)
    fft_v1 = fft_transform(v1)
    ratio = norm_v1 / (norm_v0 + 1e-10)
    if ratio < b:
        result_fft = fft_v0 + fft_v1 * t
    else:
        result_fft = interpolate_fft_components(
            fft_v0, fft_v1, t=t, t_sum=t_sum, cutoff_pct=cutoff_pct, cull_pct=cull_pct
        )
    merged = ifft_transform(result_fft)
    merged = torch.where(torch.isnan(merged), torch.zeros_like(merged), merged)
    if torch.any(torch.isinf(merged)):
        raise ValueError("Inf in ifft output")
    return merged, norm_v0, norm_v1


def cosine_correlation(stack):
    n = stack.shape[0]
    matrix = torch.zeros(n, n)
    for i in range(n):
        for j in range(i + 1, n):
            matrix[i, j] = matrix[j, i] = (
                torch.nn.functional.cosine_similarity(stack[i], stack[j], dim=0)
                .nan_to_num(0)
                .mean()
                .item()
            )
    return matrix

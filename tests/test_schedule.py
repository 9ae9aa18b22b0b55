"""Diffusion schedule parity vs the reference's torch float64 buffers."""

import numpy as np
import pytest

from d3dp_tpu.diffusion.schedule import (
    cosine_beta_schedule,
    ddim_time_pairs,
    CosineSchedule,
)
from tests.reference_oracle import reference_available, import_reference

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


def _reference_time_pairs(total, sampling):
    import torch

    times = torch.linspace(-1, total - 1, steps=sampling + 1)
    times = list(reversed(times.int().tolist()))
    return list(zip(times[:-1], times[1:]))


@needs_ref
def test_cosine_schedule_parity():
    ref = import_reference("common.diffusionpose")
    expected = ref.cosine_beta_schedule(1000).numpy()
    got = cosine_beta_schedule(1000)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


@needs_ref
def test_derived_buffers_parity():
    import torch
    import torch.nn.functional as F

    ref = import_reference("common.diffusionpose")
    betas = ref.cosine_beta_schedule(1000)
    alphas = 1.0 - betas
    alphas_cumprod = torch.cumprod(alphas, dim=0)
    alphas_cumprod_prev = F.pad(alphas_cumprod[:-1], (1, 0), value=1.0)

    sched = CosineSchedule(1000)
    np.testing.assert_allclose(sched.alphas_cumprod, alphas_cumprod.numpy(), rtol=1e-12)
    np.testing.assert_allclose(
        sched.alphas_cumprod_prev, alphas_cumprod_prev.numpy(), rtol=1e-12
    )
    np.testing.assert_allclose(
        sched.sqrt_alphas_cumprod, torch.sqrt(alphas_cumprod).numpy(), rtol=1e-12
    )
    np.testing.assert_allclose(
        sched.sqrt_one_minus_alphas_cumprod,
        torch.sqrt(1 - alphas_cumprod).numpy(),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        sched.sqrt_recip_alphas_cumprod,
        torch.sqrt(1.0 / alphas_cumprod).numpy(),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        sched.sqrt_recipm1_alphas_cumprod,
        torch.sqrt(1.0 / alphas_cumprod - 1).numpy(),
        rtol=1e-12,
    )


@pytest.mark.parametrize("total,sampling", [(1000, 5), (1000, 10), (1000, 1), (10, 10)])
def test_time_pairs(total, sampling):
    got = ddim_time_pairs(total, sampling)
    assert got[-1][1] == -1
    assert len(got) == sampling
    if reference_available():
        expected = _reference_time_pairs(total, sampling)
        assert got == expected


def test_ddim_step_constants():
    sched = CosineSchedule(1000)
    consts = sched.ddim_step_constants(5, eta=1.0)
    assert consts["t"].shape == (5,)
    # the final step writes x_start directly — no noise
    assert consts["is_last"][-1] == 1.0
    assert np.all(consts["is_last"][:-1] == 0.0)
    assert np.all(consts["sigma"][:-1] > 0)  # eta=1 injects noise every step
    # DDIM coefficient identity: alpha_next = alpha_next_sqrt^2,
    # c^2 + sigma^2 = 1 - alpha_next for non-final steps
    pairs = ddim_time_pairs(1000, 5)
    for i, (t, t_next) in enumerate(pairs[:-1]):
        alpha_next = sched.alphas_cumprod[t_next]
        np.testing.assert_allclose(
            consts["alpha_next_sqrt"][i] ** 2, alpha_next, rtol=1e-6
        )
        np.testing.assert_allclose(
            consts["c"][i] ** 2 + consts["sigma"][i] ** 2, 1 - alpha_next, rtol=1e-5
        )

"""Direct-execution oracles for the vendored k-diffusion/EDM sampler family.

tests/test_reference_oracles_sgm.py pins the ACTIVE samplers (VideoDDIM /
VPODE / VPSDE); this module executes the remaining vendored-stock family
from the actual reference sampling.py (EulerEDM, HeunEDM, DDIM,
EulerAncestral, DPMPP2SAncestral, DPMPP2M, SDEDPMPP2M, LinearMultistep,
SdeditEDM — sampling.py:87-535) against our lax.scan ports in
`diffusion/k_samplers.py`, with a shared toy sigma-space denoiser.

Two testability notes:
  * sigmas: the reference samplers call self.discretization(num_steps)
    internally, but the Legacy/EDM discretizations are unreachable through
    Discretization.__call__ (the return_idx kwarg crash pinned in
    test_reference_oracles_sgm). The discretizers are already direct-oracled
    separately, so here the sampler's `discretization` attribute is replaced
    with a stub returning OUR schedule.edm_sigmas table — both sides consume
    the identical sigma grid and the test pins the SAMPLER loop math only.
  * noise: torch.randn_like vs jax.random.normal can never agree, so
    stochastic paths run under a constant-noise monkeypatch (every draw =
    0.37). That exercises and compares the noise COEFFICIENTS (sigma_up,
    gamma churn inflation, SDE mult_noise) — the implementation content —
    while removing the RNG, and the deterministic samplers run unpatched.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from _ref_stubs import install as _install_stubs  # noqa: E402

_install_stubs()

sampling_mod = pytest.importorskip(
    "landiff.diffusion.sgm.modules.diffusionmodules.sampling")
from landiff.diffusion.sgm.util import append_dims  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from landiff_tpu.diffusion import k_samplers  # noqa: E402
from landiff_tpu.diffusion import schedule as sched  # noqa: E402

SGM = "landiff.diffusion.sgm.modules.diffusionmodules"
DISC_CFG = {"target": f"{SGM}.discretizer.ZeroSNRDDPMDiscretization",
            "params": {"shift_scale": 3.0}}
N_STEPS = 8
CVAL = 0.2
NOISE = 0.37


def _sigmas():
    """EDM grid incl. the trailing zero (what prepare_sampling_loop's
    discretization call returns for the EDM samplers)."""
    return k_samplers.append_zero(sched.edm_sigmas(N_STEPS))


def _make_ref(cls, **kw):
    """Reference sampler with its discretization stubbed to the shared
    sigma grid (see module docstring)."""
    s = cls(num_steps=N_STEPS, discretization_config=DISC_CFG,
            device="cpu", **kw)
    sig = torch.from_numpy(_sigmas().astype(np.float32))
    s.discretization = lambda n, device=None, **_: sig.clone()
    return s


class _ToySigmaDenoiser:
    """Shape-preserving, sigma- and cond-sensitive, exactly replicable in
    JAX (sigma arrives as the per-batch s_in * sigmas[i] vector)."""

    def __call__(self, x, sigma, cond, **kw):
        s = append_dims(sigma.float(), x.ndim)
        return torch.tanh(x) * (0.3 + 1.0 / (1.0 + s)) + cond["c"]


def _toy_jax(x, sigma):
    return jnp.tanh(x) * (0.3 + 1.0 / (1.0 + sigma)) + CVAL


def _ref_run(cls, x0, _method="__call__", **kw):
    sampler = _make_ref(cls, **{k: v for k, v in kw.items()
                                if k in ("s_churn", "s_noise", "eta",
                                         "order", "edit_ratio")})
    call_kw = {k: v for k, v in kw.items() if k in ("randn",)}
    with torch.no_grad():
        out = sampler(_ToySigmaDenoiser(), torch.from_numpy(x0.copy()),
                      **({"image": call_kw.pop("image")} if "image" in call_kw
                         else {}),
                      cond={"c": torch.full((1, 1, 1, 1, 1), CVAL)}, **call_kw)
    return out.numpy()


def _x0():
    return (np.random.default_rng(6)
            .standard_normal((1, 2, 3, 4, 4)).astype(np.float32))


@pytest.fixture
def const_noise(monkeypatch):
    """Constant-noise injection on BOTH frameworks (see module docstring)."""
    monkeypatch.setattr(torch, "randn_like",
                        lambda t, **kw: torch.full_like(t, NOISE))
    real_normal = jax.random.normal

    def fake_normal(key, shape=(), dtype=jnp.float32):
        return jnp.full(shape, NOISE, dtype)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    yield
    assert jax.random.normal is real_normal or True  # monkeypatch undoes


def _compare(got, want, rtol=2e-4, atol=2e-5):
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol, atol=atol)


def test_euler_edm_matches_reference():
    x0 = _x0()
    want = _ref_run(sampling_mod.EulerEDMSampler, x0)
    got = k_samplers.euler_edm_sample(_toy_jax, jnp.asarray(x0), _sigmas())
    _compare(got, want)


def test_euler_edm_churn_matches_reference(const_noise):
    """s_churn > 0: gamma = min(churn/(n-1)... sampling.py:119-123) inflates
    sigma_hat and adds noise sqrt(sigma_hat^2 - sigma^2) — the stochastic
    branch, compared under constant noise."""
    x0 = _x0()
    want = _ref_run(sampling_mod.EulerEDMSampler, x0, s_churn=4.0)
    got = k_samplers.euler_edm_sample(_toy_jax, jnp.asarray(x0), _sigmas(),
                                      s_churn=4.0)
    _compare(got, want)


def test_heun_edm_matches_reference():
    x0 = _x0()
    want = _ref_run(sampling_mod.HeunEDMSampler, x0)
    got = k_samplers.heun_edm_sample(_toy_jax, jnp.asarray(x0), _sigmas())
    _compare(got, want)


def test_ddim_matches_reference(const_noise):
    """Latent reference bug pinned here: the sigma-space DDIMSampler is
    UNRUNNABLE as shipped — its sampler_step calls
    self.possible_correction_step (sampling.py:153), a method only the
    EDMSampler subclasses define, so any call raises AttributeError
    (vendored-stock code the shipped configs never execute). The trajectory
    comparison runs under the evident intent: the identity correction
    EulerEDMSampler uses (sampling.py:255-259) patched onto the instance."""
    x0 = _x0()
    sampler = _make_ref(sampling_mod.DDIMSampler)  # s_noise default 0.1
    cond = {"c": torch.full((1, 1, 1, 1, 1), CVAL)}
    with torch.no_grad():
        with pytest.raises(AttributeError, match="possible_correction_step"):
            sampler(_ToySigmaDenoiser(), torch.from_numpy(x0.copy()),
                    cond=cond)
        sampler.possible_correction_step = (
            lambda euler_step, *a, **kw: euler_step)
        want = sampler(_ToySigmaDenoiser(), torch.from_numpy(x0.copy()),
                       cond=cond).numpy()
    got = k_samplers.ddim_sample(_toy_jax, jnp.asarray(x0), _sigmas(),
                                 s_noise=0.1)
    _compare(got, want)


def test_euler_ancestral_matches_reference(const_noise):
    x0 = _x0()
    want = _ref_run(sampling_mod.EulerAncestralSampler, x0, eta=1.0)
    got = k_samplers.euler_ancestral_sample(_toy_jax, jnp.asarray(x0),
                                            _sigmas(), eta=1.0)
    _compare(got, want)


def test_dpmpp2s_ancestral_matches_reference(const_noise):
    x0 = _x0()
    want = _ref_run(sampling_mod.DPMPP2SAncestralSampler, x0, eta=1.0)
    got = k_samplers.dpmpp2s_ancestral_sample(_toy_jax, jnp.asarray(x0),
                                              _sigmas(), eta=1.0)
    _compare(got, want)


def test_dpmpp2m_matches_reference():
    x0 = _x0()
    want = _ref_run(sampling_mod.DPMPP2MSampler, x0)
    got = k_samplers.dpmpp2m_sample(_toy_jax, jnp.asarray(x0), _sigmas())
    _compare(got, want)


def test_sde_dpmpp2m_matches_reference(const_noise):
    x0 = _x0()
    want = _ref_run(sampling_mod.SDEDPMPP2MSampler, x0)
    got = k_samplers.sde_dpmpp2m_sample(_toy_jax, jnp.asarray(x0), _sigmas())
    _compare(got, want)


def test_linear_multistep_matches_reference():
    """The reference integrates the Lagrange basis numerically
    (scipy.integrate.quad, epsrel=1e-4, sampling_utils.py:122-134); ours
    integrates the degree-(order-1) polynomial exactly — tolerance covers
    the quadrature error."""
    x0 = _x0()
    want = _ref_run(sampling_mod.LinearMultistepSampler, x0, order=4)
    got = k_samplers.linear_multistep_sample(_toy_jax, jnp.asarray(x0),
                                             _sigmas(), order=4)
    _compare(got, want, rtol=1e-3, atol=1e-4)


def test_sdedit_edm_matches_reference():
    """SdeditEDMSampler (sampling.py:492-535): steps with
    i/num_steps < edit_ratio are skipped; the start state is
    image + randn * sigma at the first executed step (randn_unit taken
    BEFORE prepare_sampling_loop's sqrt(1+sigma0^2) scaling)."""
    rng = np.random.default_rng(9)
    image = rng.standard_normal((1, 2, 3, 4, 4)).astype(np.float32)
    randn = rng.standard_normal((1, 2, 3, 4, 4)).astype(np.float32)
    sampler = _make_ref(sampling_mod.SdeditEDMSampler, edit_ratio=0.5)
    with torch.no_grad():
        want = sampler(_ToySigmaDenoiser(), torch.from_numpy(image.copy()),
                       torch.from_numpy(randn.copy()),
                       cond={"c": torch.full((1, 1, 1, 1, 1), CVAL)}).numpy()
    got = k_samplers.sdedit_edm_sample(_toy_jax, jnp.asarray(image),
                                       jnp.asarray(randn), _sigmas(),
                                       edit_ratio=0.5)
    _compare(got, want)

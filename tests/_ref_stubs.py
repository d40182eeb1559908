"""Import-time stubs that unlock the reference's sgm / vae_modules subset
for DIRECT-EXECUTION oracles (tests/test_reference_oracles_sgm.py).

The reference's diffusion stack imports four packages this image doesn't
ship: beartype, omegaconf, tqdm, pytorch_lightning. None of them affects
the MATH under test —
  - beartype.typing is a re-export of typing (cp_enc_dec.py:8),
  - omegaconf's ListConfig/OmegaConf appear only in isinstance checks and
    type unions (sampling.py:8, encoders/modules.py:7),
  - tqdm is a progress bar (sampling.py:9),
  - pl.LightningModule is only a base class for AbstractAutoencoder
    (sgm/models/autoencoder.py:8,29) whose training hooks we never call —
so minimal stand-ins installed in sys.modules BEFORE the reference import
make the actual reference modules importable and runnable. The modules
under test (discretizer/guiders/sampling/denoiser/cp_enc_dec/encoders)
are executed verbatim from /root/reference, NOT transcribed.
"""

import sys
import types
import typing


def install():
    """Install the stub modules (idempotent). Never overrides a real
    package if one is importable."""
    if "beartype" not in sys.modules:
        try:
            import beartype  # noqa: F401
        except ImportError:
            bt = types.ModuleType("beartype")

            def _beartype(fn=None, **kw):
                if fn is None:
                    return lambda f: f
                return fn

            bt.beartype = _beartype
            bt.typing = typing
            sys.modules["beartype"] = bt
            # `from beartype.typing import Tuple` resolves through
            # sys.modules["beartype.typing"]
            sys.modules["beartype.typing"] = typing

    if "omegaconf" not in sys.modules:
        try:
            import omegaconf  # noqa: F401
        except ImportError:
            om = types.ModuleType("omegaconf")

            class ListConfig(list):
                pass

            class DictConfig(dict):
                pass

            class OmegaConf:
                @staticmethod
                def to_container(cfg, resolve=True):
                    return cfg

                @staticmethod
                def create(obj=None):
                    if isinstance(obj, list):
                        return ListConfig(obj)
                    return DictConfig(obj or {})

            om.ListConfig = ListConfig
            om.DictConfig = DictConfig
            om.OmegaConf = OmegaConf
            sys.modules["omegaconf"] = om

    if "tqdm" not in sys.modules:
        try:
            import tqdm  # noqa: F401
        except ImportError:
            td = types.ModuleType("tqdm")

            class _tqdm:
                def __init__(self, iterable=None, *a, **kw):
                    self.iterable = iterable if iterable is not None else []

                def __iter__(self):
                    return iter(self.iterable)

                def __enter__(self):
                    return self

                def __exit__(self, *a):
                    return False

                def update(self, *a, **kw):
                    pass

                def close(self):
                    pass

                @staticmethod
                def write(*a, **kw):
                    pass

            td.tqdm = _tqdm
            td.trange = lambda *a, **kw: _tqdm(range(*a))
            sys.modules["tqdm"] = td

    if "pytorch_lightning" not in sys.modules:
        try:
            import pytorch_lightning  # noqa: F401
        except ImportError:
            import torch

            pl = types.ModuleType("pytorch_lightning")

            class LightningModule(torch.nn.Module):
                def save_hyperparameters(self, *a, **kw):
                    pass

            pl.LightningModule = LightningModule
            pl.__version__ = "2.0.0"
            sys.modules["pytorch_lightning"] = pl


def init_reference_context_parallel():
    """Single-process gloo process group + context-parallel size 1, so the
    reference VAE's CP plumbing (sgm/util.py:18-84, asserted-initialized
    from cp_enc_dec.py forwards) runs its world_size==1 identity paths.
    Idempotent; returns the sgm.util module."""
    import tempfile

    import torch.distributed as dist

    if not dist.is_initialized():
        store_file = tempfile.NamedTemporaryFile(
            prefix="landiff_oracle_pg_", delete=False)
        store_file.close()
        dist.init_process_group(
            "gloo", init_method=f"file://{store_file.name}",
            rank=0, world_size=1)

    from landiff.diffusion.sgm import util as sgm_util

    if not sgm_util.is_context_parallel_initialized():
        sgm_util.initialize_context_parallel(1)
    return sgm_util

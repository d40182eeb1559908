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

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            import importlib.machinery

            import torch

            def _mk(name):
                m = types.ModuleType(name)
                # transformers probes importlib.util.find_spec("torchvision")
                # which raises on spec-less stubs
                m.__spec__ = importlib.machinery.ModuleSpec(name, None)
                sys.modules[name] = m
                return m

            tv = _mk("torchvision")
            tv.__version__ = "0.0.0-stub"
            tr = _mk("torchvision.transforms")
            v2 = _mk("torchvision.transforms.v2")
            fn = _mk("torchvision.transforms.v2.functional")

            def _tv_pad(img, padding, fill=0):
                """torchvision v2 pad with [left, top, right, bottom] order
                (the semantics condition.py:15-27 relies on)."""
                left, top, right, bottom = padding
                if not torch.is_tensor(fill):
                    if isinstance(fill, (list, tuple)):
                        fill_t = torch.tensor(fill, dtype=img.dtype)
                    else:
                        fill_t = torch.tensor([fill], dtype=img.dtype)
                else:
                    fill_t = fill.to(img.dtype)
                h, w = img.shape[-2:]
                out_shape = list(img.shape)
                out_shape[-2] = h + top + bottom
                out_shape[-1] = w + left + right
                out = fill_t.reshape((-1,) + (1,) * 2).expand(
                    *img.shape[:-2], out_shape[-2], out_shape[-1]).clone() \
                    if fill_t.numel() > 1 else torch.full(
                        out_shape, float(fill_t), dtype=img.dtype)
                out = out.to(img.dtype)
                out[..., top:top + h, left:left + w] = img
                return out

            def _tv_to_dtype(x, dtype=None, scale=False):
                if scale and x.dtype.is_floating_point and \
                        dtype == torch.uint8:
                    return (x * 255.0).round().clamp(0, 255).to(torch.uint8)
                return x.to(dtype)

            fn.pad = _tv_pad
            fn.to_dtype = _tv_to_dtype
            v2.functional = fn
            tr.v2 = v2
            tv.transforms = tr

            # import-only: lpips.py:7 does `from torchvision import models`
            # (models.vgg16 is touched only if an LPIPS loss is constructed,
            # which the shipped inference configs never do)
            mdl = _mk("torchvision.models")

            def _no_vgg(*a, **kw):
                raise NotImplementedError(
                    "torchvision stub: vgg16 needs pretrained weights + "
                    "network; the shipped LanDiff configs never construct "
                    "LPIPS")

            mdl.vgg16 = _no_vgg
            tv.models = mdl

    if "vector_quantize_pytorch" not in sys.modules:
        try:
            import vector_quantize_pytorch  # noqa: F401
        except ImportError:
            import torch
            from torch import nn

            vq = types.ModuleType("vector_quantize_pytorch")

            class FSQ(nn.Module):
                """Type marker only: the shipped tokenizer config builds a
                VectorQuantize quantizer (tokenizer_cfg.py:89-95); FSQ
                appears solely in isinstance checks
                (video_titok_vq.py:91)."""

                def __init__(self, *a, **kw):
                    raise NotImplementedError(
                        "FSQ stub: the shipped LanDiff tokenizer uses "
                        "VectorQuantize")

            class _EuclideanCodebook(nn.Module):
                """Buffer layout pinned by the RELEASED tokenizer
                checkpoint's key inventory (ckpt/manifests.py
                tokenizer_safetensors: quantizer._codebook.{embed (1,K,cd),
                initted (1,), cluster_size (1,K), embed_avg (1,K,cd)})."""

                def __init__(self, codebook_size, dim):
                    super().__init__()
                    self.register_buffer(
                        "initted", torch.zeros(1, dtype=torch.bool))
                    self.register_buffer(
                        "cluster_size", torch.zeros(1, codebook_size))
                    self.register_buffer(
                        "embed", torch.zeros(1, codebook_size, dim))
                    self.register_buffer(
                        "embed_avg", torch.zeros(1, codebook_size, dim))

            class VectorQuantize(nn.Module):
                """Inference surface of vector_quantize_pytorch's
                VectorQuantize, single-head channel-last form as the
                shipped config constructs it (tokenizer_cfg.py:89-95:
                codebook_size=2048, dim=768, codebook_dim=16, kmeans_init,
                threshold_ema_dead_code=2): project_in dim->codebook_dim,
                EuclideanCodebook, project_out codebook_dim->dim.
                get_output_from_indices == codebook gather + project_out —
                the only method LanDiff's inference path calls
                (video_titok_vq.py:93-94). The training path (EMA/kmeans)
                is NOT recreated here; landiff_tpu/models/vq.py implements
                it natively with its own tests."""

                def __init__(self, *, codebook_size, dim, codebook_dim=None,
                             kmeans_init=False, threshold_ema_dead_code=0,
                             **kw):
                    super().__init__()
                    self.codebook_size = codebook_size
                    self.dim = dim
                    codebook_dim = codebook_dim if codebook_dim is not None \
                        else dim
                    self.codebook_dim = codebook_dim
                    requires_projection = codebook_dim != dim
                    self.project_in = nn.Linear(dim, codebook_dim) \
                        if requires_projection else nn.Identity()
                    self.project_out = nn.Linear(codebook_dim, dim) \
                        if requires_projection else nn.Identity()
                    self._codebook = _EuclideanCodebook(codebook_size,
                                                        codebook_dim)

                @property
                def codebook(self):
                    return self._codebook.embed[0]

                def get_codes_from_indices(self, indices):
                    return self._codebook.embed[0][indices]

                def get_output_from_indices(self, indices):
                    return self.project_out(
                        self.get_codes_from_indices(indices))

                def forward(self, x, **kw):
                    raise NotImplementedError(
                        "VectorQuantize stub implements the inference "
                        "index->code surface only")

            vq.FSQ = FSQ
            vq.VectorQuantize = VectorQuantize
            sys.modules["vector_quantize_pytorch"] = vq

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

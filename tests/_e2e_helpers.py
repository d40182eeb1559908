"""Tiny-world builders for the composed two-stage E2E direct-execution
oracle (tests/test_reference_oracle_e2e.py).

The reference's pipeline glue instantiates its submodules through
instantiate_from_config target strings (sgm/util.py:282-292); this module
registers itself in sys.modules as `landiff_e2e_helpers` so those strings
can resolve tiny, offline-constructible stand-ins for exactly TWO leaves
that cannot be built verbatim in this image:

  * build_tiny_vq      — a fiddle Config for the REAL VideoVQ
                         (landiff/tokenizer/models/video_titok_vq.py) with
                         real TiTokEncoder/Decoder blocks at
                         tiny_test_config dims; the quantizer is the
                         vector_quantize_pytorch stand-in from _ref_stubs
                         (inference index->code surface, buffer layout
                         pinned by the released checkpoint's key
                         inventory). Mirrors tokenizer_cfg.build_tokenizer
                         (tokenizer_cfg.py:60-116) at tiny scale.
  * TinyT5Embedder     — the REAL FrozenT5Embedder
                         (sgm/modules/encoders/modules.py:246-295) with
                         only __init__ replaced: from_pretrained needs
                         sentencepiece + network, so the tokenizer is a
                         deterministic byte-hash duck (HashT5Tokenizer)
                         and the T5EncoderModel is a tiny random-init HF
                         model injected by the test. forward()/encode()
                         execute VERBATIM.

plus DuckFlanT5, the stage-1 text encoder stand-in for TextCond
(llm/modules/conditioner.py:173-264): TextCond reads
.dimension/.fwd_dtype/.max_length and calls encode_texts_padded /
tokenize_padded; the duck implements those with the same byte-hash
tokenizer + the same tiny HF T5, so OUR pipeline (whose offline fallback
tokenizer is the same byte-hash — landiff_tpu/pipeline/text.py _fallback)
sees identical token ids and a T5 whose parity is pinned separately
(tests/test_t5.py golden).
"""

import sys
import types

import numpy as np
import torch
from torch import nn

VOCAB = 32128  # landiff_tpu.pipeline.text.T5Text default vocab_size


def hash_ids(text: str, max_length: int) -> list[int]:
    """Byte-hash token ids, identical to T5Text._fallback
    (landiff_tpu/pipeline/text.py): per-byte Knuth hash into [2, VOCAB-1],
    then EOS (1)."""
    b = text.encode()[: max_length - 1]
    ids = [(c * 2654435761) % (VOCAB - 2) + 2 for c in b]
    ids.append(1)
    return ids


class HashT5Tokenizer:
    """Duck HF tokenizer for FrozenT5Embedder.forward's call signature
    (modules.py:278-287): honors truncation/max_length/padding=max_length/
    return_tensors='pt', producing the same right-padded ids as
    T5Text._fallback(pad_to_max=True)."""

    def __call__(self, text, truncation=True, max_length=77,
                 return_length=False, return_overflowing_tokens=False,
                 padding="max_length", return_tensors="pt"):
        assert padding == "max_length" and return_tensors == "pt"
        if isinstance(text, str):
            text = [text]
        ids = np.zeros((len(text), max_length), np.int64)
        for i, t in enumerate(text):
            s = hash_ids(t, max_length)
            ids[i, : len(s)] = s
        return {"input_ids": torch.from_numpy(ids)}


class DuckFlanT5(nn.Module):
    """Stage-1 text-encoder stand-in for TextCond: byte-hash tokenize with
    LEFT padding (text_encoder.py:39 padding_side='left') + a tiny HF
    T5EncoderModel. Attribute/call surface = what TextCond consumes
    (conditioner.py:197-244, 309-323)."""

    def __init__(self, transformer, max_length: int):
        super().__init__()
        self.transformer = transformer
        self.dimension = transformer.config.d_model
        self.fwd_dtype = torch.float32
        self.max_length = max_length

    def _ids_and_mask(self, texts):
        seqs = [hash_ids(t, self.max_length) for t in texts]
        L = max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), L), np.int64)
        mask = np.zeros((len(seqs), L), np.int64)
        for i, s in enumerate(seqs):                 # left padding
            ids[i, L - len(s):] = s
            mask[i, L - len(s):] = 1
        return torch.from_numpy(ids), torch.from_numpy(mask)

    def tokenize_padded(self, texts):
        ids, mask = self._ids_and_mask(texts)
        return types.SimpleNamespace(input_ids=ids, attention_mask=mask)

    def encode_texts_padded(self, texts):
        ids, mask = self._ids_and_mask(texts)
        with torch.no_grad():
            out = self.transformer(input_ids=ids, attention_mask=mask)
        return out.last_hidden_state, mask.bool()


def _titok_common(tok):
    """Real TiTok block kwargs at tiny_test_config.tokenizer dims — the
    exact build test_reference_oracles._titok_modules pins against
    ckpt/manifests and the TiTok forward oracles."""
    from landiff.modules.pos_emb import Rope3DPosEmb
    from landiff.tokenizer.modules import blocks as ref_blocks

    t = tok.titok
    rope = Rope3DPosEmb(
        dim=t.rope.dim, max_time=t.rope.max_time, max_height=t.rope.max_height,
        max_width=t.rope.max_width, one_dim_max_time=t.rope.one_dim_max_time,
        multiple=16, device="cpu")
    return ref_blocks, dict(
        image_size=(t.grid_h, t.grid_w), image_channels=tok.feature_dim,
        patch_size=1, model_size="small", width=t.width,
        num_layers=t.num_layers, num_heads=t.num_heads,
        num_latent_tokens=t.latent_tokens, token_size=t.token_size,
        qk_norm=False, causal=False, bias=False, use_cls_token=False,
        rope_layer=rope,
        positional_embedding_type=ref_blocks.PositionalEmbedingType.ROPE_3D,
        attention_imp=ref_blocks.AttentionImp.TORCH,
        temporal_size=t.temporal_size, PFrame_tokens=t.pframe_latent_tokens)


def build_tiny_vq():
    """fiddle Config for the REAL VideoVQ at tiny dims — resolved by
    VideoVQWrap via config_str (vq_warp.py:29-36), exactly like the shipped
    'landiff.tokenizer.tokenizer_cfg.build_tokenizer'."""
    import fiddle as fdl
    import vector_quantize_pytorch
    from landiff.tokenizer.models.video_titok_vq import VideoVQ

    from landiff_tpu.config import tiny_test_config

    tok = tiny_test_config().tokenizer
    ref_blocks, common = _titok_common(tok)
    enc = ref_blocks.TiTokEncoder(
        attention_mask_type=ref_blocks.AttentionMaskType.VIDEO_ENCODER_MASK,
        inside_latent_tokens=True, **common)
    dec = ref_blocks.TiTokDecoder(
        attention_mask_type=ref_blocks.AttentionMaskType.VIDEO_DECODER_MASK,
        output_channels=tok.feature_dim, **common)
    quant = vector_quantize_pytorch.VectorQuantize(
        codebook_size=tok.vq.codebook_size, dim=tok.vq.dim,
        kmeans_init=True, threshold_ema_dead_code=2,
        codebook_dim=tok.vq.codebook_dim)
    return fdl.Config(
        VideoVQ,
        feature_extractor=None,
        fwd_dtype=torch.float32,
        encoder=enc,
        decoder=dec,
        num_latent_tokens=None,
        quantizer=quant,
        re_loss_fn=torch.nn.MSELoss(reduction="mean"),
        commit_loss_weight=1.0,
        model_type="transformer",
        mean_std_dim=tok.feature_dim,
        ckpt_path=None,
    )


def _abstract_emb_model():
    from landiff.diffusion.sgm.modules.encoders import modules as enc_mod

    return enc_mod


class _TinyT5EmbedderFactory:
    """Deferred class creation: FrozenT5Embedder is only importable after
    _ref_stubs.install(), so the subclass is built on first access."""

    _cls = None

    @classmethod
    def get(cls):
        if cls._cls is None:
            enc_mod = _abstract_emb_model()

            class TinyT5Embedder(enc_mod.FrozenT5Embedder):
                """REAL FrozenT5Embedder with only __init__ replaced (the
                from_pretrained calls need sentencepiece + network);
                forward()/encode() run verbatim. The test injects the tiny
                HF T5EncoderModel via the `transformer` class attribute
                before the conditioner instantiates this target."""

                shared_transformer = None

                def __init__(self, max_length=77):
                    enc_mod.AbstractEmbModel.__init__(self)
                    assert type(self).shared_transformer is not None, \
                        "test must set TinyT5Embedder.shared_transformer"
                    self.tokenizer = HashT5Tokenizer()
                    self.transformer = type(self).shared_transformer
                    self.device = "cpu"
                    self.max_length = max_length
                    self.freeze()

            cls._cls = TinyT5Embedder
        return cls._cls


def __getattr__(name):
    if name == "TinyT5Embedder":
        return _TinyT5EmbedderFactory.get()
    raise AttributeError(name)


def install():
    """Register this module under the import name instantiate_from_config
    target strings use (idempotent)."""
    sys.modules.setdefault("landiff_e2e_helpers", sys.modules[__name__])

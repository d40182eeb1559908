"""Minimal SwissArmyTransformer (SAT) skeleton enabling DIRECT-EXECUTION
oracles for the reference DiT (tests/test_reference_oracle_dit.py).

The reference DiT (landiff/diffusion/dit_video_concat.py) is built as SAT
mixins: ALL the LanDiff-specific math — the 12-way adaLN modulation chain
(:540-629), the qk-LN attention_fn wrapper (:636-664), patch/3D-sincos
position embeddings (:25-246), the final layer (:413-460), control-branch
zero linears (:1203-1238), full-sequence control adds (:1351-1370) and the
ControlDiffWarp wiring (:1164-1200) — lives in that reference file and
EXECUTES VERBATIM on top of this skeleton. What SAT itself contributes is
transformer glue, re-implemented here from its public API surface exactly
as dit_video_concat.py consumes it:

  module structure   transformer.layers.{i}.{input_layernorm,
                     attention.query_key_value/dense,
                     post_attention_layernorm, mlp.dense_h_to_4h/
                     dense_4h_to_h}, transformer.final_layernorm,
                     word/position embeddings (deleted by the mixins'
                     reinit) — pinned by the RELEASED checkpoint's
                     state-dict key inventory (ckpt/manifests.dit_sat,
                     itself asserted against these modules at production
                     size in the oracle test)
  hook dispatch      word_embedding / position_embedding / attention /
                     mlp / layer / final forward + attention_fn; mixins
                     override defaults in registration order and
                     @non_conflict chains old_impl (the reference relies
                     on this at :363 and :646)
  default attention  qkv linear -> split last dim in 3 -> per-head
                     (b, nh, s, hd) transpose -> attention_fn (scaled
                     scores, additive -10000 masking skipped for the
                     all-ones (1,1) mask the DiT passes at :905-907,
                     softmax, pv) -> head merge -> dense
  forward loop       word_emb (+ pos_emb when the hook returns non-None)
                     -> embedding dropout -> N x layer_forward ->
                     final_layernorm -> final_forward; with
                     output_hidden_states=True each layer appends
                     {'hidden_states': h} — the exact contract
                     ControlDiffusionTransformer.forward consumes at
                     :1023-1027 and ControlAdaLNMixin reads back at
                     :1352-1370

LayerNorm instances are created by calling the `layernorm` factory the
DiT passes in (partial(LayerNorm, elementwise_affine=..., eps=1e-6),
dit_video_concat.py:735-740) with only the hidden size, so the bound
eps=1e-6 takes effect — matching the CogVideoX-SAT convention our JAX
implementation transcribed.

Everything here is glue with a single observable contract; a deviation
would surface as an oracle MISMATCH against the independently-written JAX
implementation (models/dit.py), not as a silent shared bug — the two
sides share no code.
"""

import math
import sys
import types
from functools import partial

import torch
import torch.nn.functional as F
from torch import nn

HOOK_NAMES = (
    "word_embedding_forward",
    "position_embedding_forward",
    "attention_forward",
    "cross_attention_forward",
    "mlp_forward",
    "layer_forward",
    "final_forward",
    "attention_fn",
)


def non_conflict(fn):
    fn._sat_non_conflict = True
    return fn


def split_tensor_along_last_dim(tensor, num_partitions):
    last_dim_size = tensor.shape[-1] // num_partitions
    return torch.split(tensor, last_dim_size, dim=-1)


def standard_attention(query_layer, key_layer, value_layer, attention_mask,
                       attention_dropout=None, log_attention_weights=None,
                       scaling_attention_score=True, **kwargs):
    if scaling_attention_score:
        query_layer = query_layer / math.sqrt(query_layer.shape[-1])
    attention_scores = torch.matmul(query_layer, key_layer.transpose(-1, -2))
    if log_attention_weights is not None:
        attention_scores = attention_scores + log_attention_weights
    if not (attention_mask.shape[-2] == 1 and (attention_mask > 0).all()):
        attention_scores = torch.mul(attention_scores, attention_mask) - \
            10000.0 * (1.0 - attention_mask)
    attention_probs = F.softmax(attention_scores, dim=-1)
    if attention_dropout is not None:
        attention_probs = attention_dropout(attention_probs)
    return torch.matmul(attention_probs, value_layer)


def attention_fn_default(query_layer, key_layer, value_layer, attention_mask,
                         attention_dropout=None, log_attention_weights=None,
                         scaling_attention_score=True, **kwargs):
    return standard_attention(
        query_layer, key_layer, value_layer, attention_mask,
        attention_dropout=attention_dropout,
        log_attention_weights=log_attention_weights,
        scaling_attention_score=scaling_attention_score, **kwargs)


HOOKS_DEFAULT = {"attention_fn": attention_fn_default}


class BaseMixin(nn.Module):
    def reinit(self, parent_model=None):
        pass


class LayerNorm(nn.LayerNorm):
    pass


class RMSNorm(nn.Module):
    def __init__(self, normalized_shape, eps=1e-6, elementwise_affine=True):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(normalized_shape))

    def forward(self, x):
        var = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + self.eps) * self.weight


class ColumnParallelLinear(nn.Linear):
    """model_parallel_size=1 degenerate form: a plain Linear."""

    def __init__(self, input_size, output_size, bias=True,
                 gather_output=True, module=None, name=None, **kwargs):
        super().__init__(input_size, output_size, bias=bias)


class SelfAttention(nn.Module):
    def __init__(self, hidden_size, num_attention_heads, bias=True,
                 hooks=None):
        super().__init__()
        self.hidden_size = hidden_size
        self.num_attention_heads = num_attention_heads
        self.hidden_size_per_attention_head = \
            hidden_size // num_attention_heads
        self.query_key_value = nn.Linear(hidden_size, 3 * hidden_size,
                                         bias=bias)
        self.dense = nn.Linear(hidden_size, hidden_size, bias=bias)
        self.attention_dropout = nn.Dropout(0.0)
        self.output_dropout = nn.Dropout(0.0)
        object.__setattr__(self, "hooks", hooks if hooks is not None else {})

    def _transpose_for_scores(self, tensor):
        new_shape = tensor.size()[:-1] + (
            self.num_attention_heads, self.hidden_size_per_attention_head)
        tensor = tensor.view(*new_shape)
        return tensor.permute(0, 2, 1, 3)

    def forward(self, hidden_states, mask, **kw_args):
        if "attention_forward" in self.hooks:
            return self.hooks["attention_forward"](hidden_states, mask,
                                                   **kw_args)
        attention_fn = self.hooks.get("attention_fn", attention_fn_default)
        mixed_raw_layer = self.query_key_value(hidden_states)
        q, k, v = split_tensor_along_last_dim(mixed_raw_layer, 3)
        dropout_fn = self.attention_dropout if self.training else None
        q = self._transpose_for_scores(q)
        k = self._transpose_for_scores(k)
        v = self._transpose_for_scores(v)
        context = attention_fn(q, k, v, mask, dropout_fn, **kw_args)
        context = context.permute(0, 2, 1, 3).contiguous()
        context = context.view(*context.size()[:-2], self.hidden_size)
        output = self.dense(context)
        if self.training:
            output = self.output_dropout(output)
        return output


class MLP(nn.Module):
    def __init__(self, hidden_size, inner_hidden_size=None,
                 activation_func=F.gelu, bias=True, hooks=None):
        super().__init__()
        if inner_hidden_size is None:
            inner_hidden_size = 4 * hidden_size
        self.activation_func = activation_func
        self.dense_h_to_4h = nn.Linear(hidden_size, inner_hidden_size,
                                       bias=bias)
        self.dense_4h_to_h = nn.Linear(inner_hidden_size, hidden_size,
                                       bias=bias)
        self.output_dropout = nn.Dropout(0.0)
        object.__setattr__(self, "hooks", hooks if hooks is not None else {})

    def forward(self, hidden_states, **kw_args):
        if "mlp_forward" in self.hooks:
            return self.hooks["mlp_forward"](hidden_states, **kw_args)
        intermediate = self.activation_func(
            self.dense_h_to_4h(hidden_states))
        output = self.dense_4h_to_h(intermediate)
        if self.training:
            output = self.output_dropout(output)
        return output


class BaseTransformerLayer(nn.Module):
    def __init__(self, hidden_size, num_attention_heads,
                 layernorm=nn.LayerNorm, activation_func=F.gelu,
                 hooks=None):
        super().__init__()
        self.input_layernorm = layernorm(hidden_size)
        self.attention = SelfAttention(hidden_size, num_attention_heads,
                                       hooks=hooks)
        self.post_attention_layernorm = layernorm(hidden_size)
        self.mlp = MLP(hidden_size, activation_func=activation_func,
                       hooks=hooks)
        object.__setattr__(self, "hooks", hooks if hooks is not None else {})

    def forward(self, hidden_states, mask, **kw_args):
        # pre-LN default; every LanDiff model overrides via a layer_forward
        # hook (AdaLNMixin & subclasses), so this body is never the oracle
        attention_input = self.input_layernorm(hidden_states)
        attention_output = self.attention(attention_input, mask, **kw_args)
        hidden_states = hidden_states + attention_output
        mlp_input = self.post_attention_layernorm(hidden_states)
        mlp_output = self.mlp(mlp_input, **kw_args)
        return hidden_states + mlp_output


class BaseTransformer(nn.Module):
    def __init__(self, num_layers, vocab_size, hidden_size,
                 num_attention_heads, max_sequence_length,
                 embedding_dropout_prob=0.0, layernorm_order="pre",
                 parallel_output=True, is_decoder=False,
                 layernorm=nn.LayerNorm, activation_func=F.gelu,
                 hooks=None, **kwargs):
        super().__init__()
        assert layernorm_order == "pre", layernorm_order
        object.__setattr__(self, "hooks", hooks if hooks is not None else {})
        self.layernorm_order = layernorm_order
        self.parallel_output = parallel_output
        self.is_decoder = is_decoder
        self.word_embeddings = nn.Embedding(vocab_size, hidden_size)
        self.position_embeddings = nn.Embedding(max_sequence_length,
                                                hidden_size)
        self.embedding_dropout = nn.Dropout(embedding_dropout_prob)
        self.layers = nn.ModuleList([
            BaseTransformerLayer(hidden_size, num_attention_heads,
                                 layernorm=layernorm,
                                 activation_func=activation_func,
                                 hooks=self.hooks)
            for _ in range(num_layers)
        ])
        self.use_final_layernorm = True
        self.final_layernorm = layernorm(hidden_size)

    def forward(self, input_ids, position_ids, attention_mask, *,
                output_hidden_states=False, **kw_args):
        hooks = self.hooks
        if "word_embedding_forward" in hooks:
            hidden_states = hooks["word_embedding_forward"](input_ids,
                                                            **kw_args)
        else:
            hidden_states = self.word_embeddings(input_ids)
        if "position_embedding_forward" in hooks:
            position_embeddings = hooks["position_embedding_forward"](
                position_ids, **kw_args)
        else:
            position_embeddings = self.position_embeddings(position_ids)
        if position_embeddings is not None:
            hidden_states = hidden_states + position_embeddings
        hidden_states = self.embedding_dropout(hidden_states)

        output_per_layers = []
        for i, layer in enumerate(self.layers):
            if "layer_forward" in hooks:
                hidden_states = hooks["layer_forward"](
                    hidden_states, attention_mask, layer_id=i, **kw_args)
            else:
                hidden_states = layer(hidden_states, attention_mask,
                                      layer_id=i, **kw_args)
            output_this_layer = {}
            if output_hidden_states:
                output_this_layer["hidden_states"] = hidden_states
            output_per_layers.append(output_this_layer)

        if self.use_final_layernorm:
            logits = self.final_layernorm(hidden_states)
        else:
            logits = hidden_states
        if "final_forward" in hooks:
            logits = hooks["final_forward"](logits, **kw_args)
        return (logits, *output_per_layers)


class BaseModel(nn.Module):
    def __init__(self, args, transformer=None,
                 params_dtype=torch.float32, **kwargs):
        super().__init__()
        self.mixins = nn.ModuleDict()
        object.__setattr__(self, "hooks", {})
        if transformer is not None:
            self.transformer = transformer
        else:
            self.transformer = BaseTransformer(
                num_layers=args.num_layers,
                vocab_size=getattr(args, "vocab_size", 1),
                hidden_size=args.hidden_size,
                num_attention_heads=args.num_attention_heads,
                max_sequence_length=getattr(args, "max_sequence_length", 64),
                layernorm_order=getattr(args, "layernorm_order", "pre"),
                parallel_output=getattr(args, "parallel_output", True),
                is_decoder=getattr(args, "is_decoder", False),
                hooks=self.hooks,
                **kwargs,
            )

    def add_mixin(self, name, new_mixin, reinit=False):
        assert name not in self.mixins, name
        self.mixins[name] = new_mixin
        # plain-attribute assignment (NOT submodule registration: the
        # transformer must not re-appear under mixins.* in the state dict)
        object.__setattr__(new_mixin, "transformer", self.transformer)
        self.collect_hooks_()
        if reinit:
            new_mixin.reinit(self)

    def collect_hooks_(self):
        hooks = {}
        for _, mixin in self.mixins.items():
            for hook_name in HOOK_NAMES:
                if hasattr(mixin, hook_name):
                    method = getattr(mixin, hook_name)
                    fn = getattr(method, "__func__", method)
                    if getattr(fn, "_sat_non_conflict", False) and \
                            hook_name in hooks:
                        method = partial(method, old_impl=hooks[hook_name])
                    hooks[hook_name] = method
        # mutate the shared dict in place: transformer/layers/attention/mlp
        # all hold a reference to this same object
        self.hooks.clear()
        self.hooks.update(hooks)
        return self.hooks

    def disable_untrainable_params(self):
        pass

    def forward(self, *args, **kwargs):
        return self.transformer(*args, **kwargs)


def print_rank0(msg, level="info"):
    print(f"[{level}] {msg}")


def install():
    """Install the `sat` package skeleton into sys.modules (idempotent;
    never overrides a real SwissArmyTransformer installation)."""
    try:
        import sat  # noqa: F401
        return
    except ImportError:
        pass
    if "sat" in sys.modules:
        return

    sat = types.ModuleType("sat")
    helpers = types.ModuleType("sat.helpers")
    helpers.print_rank0 = print_rank0
    # import-only glue consumed by landiff/diffusion/{arguments,dif_infer}.py:
    # the composed E2E oracle bypasses CogWrapper.__init__ (whose get_args/
    # get_model/load_checkpoint calls are SAT *training* bootstrap, not math),
    # so these names exist solely to satisfy module import
    arguments = types.ModuleType("sat.arguments")
    arguments.add_data_args = lambda parser: parser
    arguments.add_evaluation_args = lambda parser: parser
    arguments.add_training_args = lambda parser: parser
    arguments.set_random_seed = lambda seed: None
    training = types.ModuleType("sat.training")
    model_io = types.ModuleType("sat.training.model_io")

    def load_checkpoint(*a, **kw):
        raise NotImplementedError(
            "sat.training.model_io.load_checkpoint stub: the oracle tests "
            "construct models directly and never load SAT checkpoints")

    model_io.load_checkpoint = load_checkpoint
    training.model_io = model_io
    model = types.ModuleType("sat.model")
    base_model = types.ModuleType("sat.model.base_model")
    base_model.BaseModel = BaseModel
    base_model.non_conflict = non_conflict

    def get_model(args, model_cls, **kwargs):
        raise NotImplementedError(
            "sat.model.base_model.get_model stub: oracle tests construct "
            "engines directly (SATControlVideoDiffusionEngine(args))")

    base_model.get_model = get_model
    mixins_mod = types.ModuleType("sat.model.mixins")
    mixins_mod.BaseMixin = BaseMixin
    mpu = types.ModuleType("sat.mpu")
    # model_parallel_size=1 degenerate form (diffusion_video.py:291-297
    # skips the noise broadcast when world size is 1)
    mpu.get_model_parallel_world_size = lambda: 1
    mpu_layers = types.ModuleType("sat.mpu.layers")
    mpu_layers.ColumnParallelLinear = ColumnParallelLinear
    ops = types.ModuleType("sat.ops")
    ops_layernorm = types.ModuleType("sat.ops.layernorm")
    ops_layernorm.LayerNorm = LayerNorm
    ops_layernorm.RMSNorm = RMSNorm
    transformer_defaults = types.ModuleType("sat.transformer_defaults")
    transformer_defaults.HOOKS_DEFAULT = HOOKS_DEFAULT
    transformer_defaults.attention_fn_default = attention_fn_default
    transformer_defaults.standard_attention = standard_attention

    sat.helpers = helpers
    sat.model = model
    sat.mpu = mpu
    sat.ops = ops
    sat.transformer_defaults = transformer_defaults
    sat.arguments = arguments
    sat.training = training
    model.base_model = base_model
    model.mixins = mixins_mod
    mpu.layers = mpu_layers
    ops.layernorm = ops_layernorm

    sys.modules["sat"] = sat
    sys.modules["sat.arguments"] = arguments
    sys.modules["sat.training"] = training
    sys.modules["sat.training.model_io"] = model_io
    sys.modules["sat.helpers"] = helpers
    sys.modules["sat.model"] = model
    sys.modules["sat.model.base_model"] = base_model
    sys.modules["sat.model.mixins"] = mixins_mod
    sys.modules["sat.mpu"] = mpu
    sys.modules["sat.mpu.layers"] = mpu_layers
    sys.modules["sat.ops"] = ops
    sys.modules["sat.ops.layernorm"] = ops_layernorm
    sys.modules["sat.transformer_defaults"] = transformer_defaults

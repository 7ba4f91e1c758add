"""Full-model pipeline-parallel training step over a ("pipe", "data") mesh.

The reference has no pipeline parallelism at all (is_parallelizable=False,
modeling_flash_t5.py:474). This integrates parallel/pipeline.py's GPipe
schedule with the complete encoder-decoder model: every transformer block
(encoder AND decoder, including block 0) lives in a stacked pytree whose
leading layer axis is sharded over the "pipe" mesh axis, so each stage holds
num_layers/S consecutive blocks of each stack. The positional-encoding bias
is computed once outside the pipeline from the (replicated) PE parameters —
which is what makes all N blocks homogeneous and stage counts that divide
num_layers (not num_layers-1) valid.

Decoder cross-attention needs the *matching* microbatch of encoder states at
whatever stage a microbatch currently occupies; the encoder states therefore
travel the ring alongside the decoder activations as a pytree microbatch
(pipeline_apply pytree support).

Gradient correctness under shard_map(check_vma=False): every stage seeds a
cotangent on its replicated copy of the loss, which scales all gradients
uniformly by the pipe size (same analysis as tp_step's `/t` correction —
sharded-leaf grads arrive via collective transposes from all S seeds;
replicated-leaf grads sum to S x the true value across stages). The step
divides the loss by S before differentiating and psums replicated leaves
over "pipe"; parity with the single-device oracle is pinned by
tests/test_pp_step.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flasht5_tpu.config import FlashT5Config
from flasht5_tpu.models import t5
from flasht5_tpu.parallel.pipeline import pipeline_apply


def make_pp_mesh(pipe: int, data: int = 1) -> Mesh:
    devs = np.array(jax.devices()[:pipe * data]).reshape(pipe, data)
    return Mesh(devs, ("pipe", "data"))


def _strip_pe(block):
    """Remove the pe_encoding subtree from a block-0 param dict (copy)."""
    block = dict(block)
    sa_layer = dict(block["self_attention_layer"])
    sa = dict(sa_layer["self_attention"])
    pe = sa.pop("pe_encoding", None)
    sa_layer["self_attention"] = sa
    block["self_attention_layer"] = sa_layer
    return block, pe


def to_pp_params(params):
    """Restructure t5.init_params output into the pipeline layout:
    all blocks stacked (leading layer axis), PE params split out."""

    def conv(stack):
        b0, pe = _strip_pe(stack["block"][0])
        blocks = [b0] + list(stack["block"][1:])
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        out = {"stacked": stacked,
               "final_layer_norm": stack["final_layer_norm"]}
        if pe is not None:
            out["pe"] = pe
        return out

    out = {"shared": params["shared"],
           "encoder": conv(params["encoder"]),
           "decoder": conv(params["decoder"])}
    if "lm_head" in params:
        out["lm_head"] = params["lm_head"]
    return out


def from_pp_params(pp_params):
    """Inverse of to_pp_params (for checkpoint interchange and tests)."""

    def conv(stack):
        n = jax.tree.leaves(stack["stacked"])[0].shape[0]
        blocks = [jax.tree.map(lambda x: x[i], stack["stacked"])
                  for i in range(n)]
        if "pe" in stack:
            sa = blocks[0]["self_attention_layer"]["self_attention"]
            sa["pe_encoding"] = stack["pe"]
        return {"block": blocks,
                "final_layer_norm": stack["final_layer_norm"]}

    out = {"shared": pp_params["shared"],
           "encoder": conv(pp_params["encoder"]),
           "decoder": conv(pp_params["decoder"])}
    if "lm_head" in pp_params:
        out["lm_head"] = pp_params["lm_head"]
    return out


def pp_param_pspecs(pp_abstract):
    """PartitionSpecs: stacked block leaves sharded over "pipe" on the layer
    axis, everything else replicated."""

    def spec_stack(stack):
        out = {"stacked": jax.tree.map(
                   lambda x: P("pipe", *([None] * (x.ndim - 1))),
                   stack["stacked"]),
               "final_layer_norm": jax.tree.map(
                   lambda x: P(*([None] * x.ndim)),
                   stack["final_layer_norm"])}
        if "pe" in stack:
            out["pe"] = jax.tree.map(lambda x: P(*([None] * x.ndim)),
                                     stack["pe"])
        return out

    specs = {"shared": jax.tree.map(lambda x: P(*([None] * x.ndim)),
                                    pp_abstract["shared"]),
             "encoder": spec_stack(pp_abstract["encoder"]),
             "decoder": spec_stack(pp_abstract["decoder"])}
    if "lm_head" in pp_abstract:
        specs["lm_head"] = jax.tree.map(lambda x: P(*([None] * x.ndim)),
                                        pp_abstract["lm_head"])
    return specs


def pp_stat_batch_dims(pp_params):
    """adamw_scale stat_batch_dims tree: stacked leaves get per-layer rms
    (leading layer axis excluded from the statistic) for exact parity with
    the per-block unstacked optimizer."""

    def is_stacked(path):
        return any(getattr(k, "key", None) == "stacked" for k in path)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: 1 if is_stacked(path) else 0, pp_params)


def _pp_forward_loss(config: FlashT5Config, params, input_ids, labels,
                     n_microbatches: int):
    """Pipeline forward + loss; runs inside shard_map per (pipe, data) shard."""
    dtype = jnp.dtype(config.dtype)
    emb = params["shared"]["embedding"]
    b, t_enc = input_ids.shape
    mb = b // n_microbatches
    d = config.d_model
    in_kernel_rpe = config.attention_type == "pallas_rpe"

    def stack_bias(stack, q_len, k_len, bidirectional):
        """Precompute the (1, H, M, N) additive bias outside the pipeline
        (except pallas_rpe, where the bucket table goes into every block and
        the bias is produced in-kernel)."""
        if in_kernel_rpe or "pe" not in stack:
            return None
        return t5._position_bias(config, stack["pe"], q_len, k_len,
                                 bidirectional=bidirectional,
                                 dtype=jnp.float32)

    def rpe_table_of(stack):
        """The replicated bucket table for the in-kernel RPE path."""
        if in_kernel_rpe and "pe" in stack:
            return stack["pe"]["relative_attention_bias"]
        return None

    def maybe_remat(f):
        if config.remat:
            return jax.checkpoint(f, policy=jax.checkpoint_policies.nothing_saveable)
        return f

    # ---- encoder pipeline ----
    enc_stack = params["encoder"]
    enc_bias = stack_bias(enc_stack, t_enc, t_enc, True)

    @maybe_remat
    def enc_fn(bp, h):
        out, _, _ = t5._block_apply(
            config, bp, h,
            is_decoder=False, has_pe=False,
            position_bias=enc_bias, rpe_table=rpe_table_of(enc_stack))
        return out

    x = jnp.take(emb, input_ids, axis=0).astype(dtype)
    enc_mb = pipeline_apply(enc_fn, enc_stack["stacked"],
                            x.reshape(n_microbatches, mb, t_enc, d), "pipe")
    enc = enc_mb.reshape(b, t_enc, d)
    enc = t5._layer_norm(config, enc_stack["final_layer_norm"]["weight"], enc)

    # ---- decoder pipeline (encoder states travel with each microbatch) ----
    dec_in = t5.shift_right(config, labels)
    t_dec = dec_in.shape[1]
    dec_stack = params["decoder"]
    dec_bias = stack_bias(dec_stack, t_dec, t_dec, False)

    @maybe_remat
    def dec_fn(bp, xtree):
        out, _, _ = t5._block_apply(
            config, bp, xtree["h"],
            is_decoder=True, has_pe=False,
            position_bias=dec_bias,
            encoder_hidden_states=xtree["enc"],
            rpe_table=rpe_table_of(dec_stack))
        return {"h": out, "enc": xtree["enc"]}

    y = jnp.take(emb, dec_in, axis=0).astype(dtype)
    dec_mb = {"h": y.reshape(n_microbatches, mb, t_dec, d),
              "enc": enc.reshape(n_microbatches, mb, t_enc, d)}
    out_mb = pipeline_apply(dec_fn, dec_stack["stacked"], dec_mb, "pipe")
    dec = out_mb["h"].reshape(b, t_dec, d)
    dec = t5._layer_norm(config, dec_stack["final_layer_norm"]["weight"], dec)

    if config.tie_word_embeddings:
        logits = t5._matmul(dec, emb.T)
    else:
        logits = t5._matmul(dec, params["lm_head"])
    return t5.compute_loss(config, logits, labels)


def make_pp_train_step(config: FlashT5Config, mesh: Mesh, tx,
                       n_microbatches: int = 4) -> Callable:
    """Jitted (pp_params, opt_state, batch, rng) -> (pp_params, opt, metrics)
    over a ("pipe", "data") mesh. Deterministic block compute (GPipe ticks
    share one program); pretraining configs run dropout 0 anyway — build-time
    error otherwise.
    """
    if config.dropout_rate > 0.0:
        raise ValueError("pipeline-parallel step supports dropout_rate=0 only")
    psize = mesh.shape["pipe"]
    if (config.num_layers % psize or
            (config.num_decoder_layers or config.num_layers) % psize):
        raise ValueError(
            f"num_layers must divide pipe size {psize} for even stages")

    abstract = jax.eval_shape(
        lambda r: to_pp_params(t5.init_params(r, config)),
        jax.random.PRNGKey(0))
    pspecs = pp_param_pspecs(abstract)
    opt_abstract = jax.eval_shape(tx.init, abstract)
    param_struct = jax.tree.structure(abstract)

    def opt_specs_for(node):
        if node is None:
            return None
        try:
            if jax.tree.structure(node) == param_struct:
                return pspecs
        except Exception:
            pass
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(opt_specs_for(c) for c in node))
        if isinstance(node, tuple):
            return tuple(opt_specs_for(c) for c in node)
        if isinstance(node, list):
            return [opt_specs_for(c) for c in node]
        if isinstance(node, dict):
            return {k: opt_specs_for(v) for k, v in node.items()}
        return P(*([None] * getattr(node, "ndim", 0)))

    opt_specs = opt_specs_for(opt_abstract)
    batch_specs = {"input_ids": P("data"), "labels": P("data")}

    def sync_grad(g, spec):
        g = jax.lax.pmean(g, "data")
        if "pipe" not in {a for a in spec if a is not None}:
            g = jax.lax.psum(g, "pipe")
        return g

    def step(params, opt_state, batch, rng):
        del rng  # deterministic compute (dropout 0 enforced at build)

        def loss_fn(p):
            return _pp_forward_loss(config, p, batch["input_ids"],
                                    batch["labels"], n_microbatches) / psize

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.pmean(loss * psize, "data")
        grads = jax.tree.map(sync_grad, grads, pspecs)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)  # local-stage norm (diagnostic)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(pspecs, opt_specs, batch_specs, P()),
        out_specs=(pspecs, opt_specs, {"loss": P(), "grad_norm": P()}),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def pp_train_state(config: FlashT5Config, mesh: Mesh, tx,
                   rng: Optional[jax.Array] = None):
    """Initialize (pp_params, opt_state) sharded for make_pp_train_step."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    abstract = jax.eval_shape(
        lambda r: to_pp_params(t5.init_params(r, config)), rng)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s),
                             pp_param_pspecs(abstract))
    params = jax.jit(lambda r: to_pp_params(t5.init_params(r, config)),
                     out_shardings=shardings)(rng)
    opt_state = jax.jit(tx.init)(params)
    return params, opt_state

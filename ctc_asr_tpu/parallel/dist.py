"""Multi-host initialization and sharded train/decode steps.

SURVEY.md §5 "Distributed communication backend" (new vs reference):
``jax.distributed.initialize()`` builds the DCN process group; inside
jit, XLA collectives over ICI carry gradient psums and decode-state
exchange. The sharded train step here is the SAME step function as
single-chip (train.py) — only the in/out shardings differ, which is the
point of the SPMD design.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import Config, MeshConfig
from .mesh import batch_sharding, build_mesh, state_shardings


def initialize_distributed(cfg: MeshConfig) -> None:
    """Multi-host process-group init (no-op for single-process runs)."""
    if cfg.coordinator_address and cfg.num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=cfg.coordinator_address,
            num_processes=cfg.num_processes,
            process_id=cfg.process_id)


def make_sharded_train_step(cfg: Config, mesh, state_template,
                            donate: bool = True):
    """jit the train step with explicit mesh shardings.

    Batch inputs shard their leading dim over 'data'; state follows
    ``state_shardings`` (replicated, or 'model'-sharded wide matmuls
    when cfg.mesh.shard_model). XLA inserts the gradient all-reduce.
    """
    from ..train import make_step_fn

    step_fn = make_step_fn(cfg)
    st_shard = state_shardings(state_template, mesh,
                               cfg.mesh.shard_model)
    bsh = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    metrics_shard = {"loss": rep, "grad_norm": rep, "lr": rep}
    return jax.jit(
        step_fn,
        in_shardings=(st_shard, bsh, bsh, bsh, bsh),
        out_shardings=(st_shard, metrics_shard),
        donate_argnums=(0,) if donate else ())


def make_sharded_eval_step(cfg: Config, mesh, shard_model: bool = False):
    """Sharded (params, samples, lens) -> (logits, logit_lens)."""
    from .. import features as feat_mod
    from ..models import apply_encoder

    def eval_fn(params, samples, sample_lengths):
        feats, flens = feat_mod.extract_features(
            samples, sample_lengths, cfg.features)
        return apply_encoder(params, feats, flens, cfg.model, train=False)

    bsh = batch_sharding(mesh)
    return jax.jit(eval_fn, in_shardings=(None, bsh, bsh),
                   out_shardings=(bsh, bsh))


def make_distributed_beam_decoder(cfg: Config, mesh, lm=None):
    """Data-sharded beam decode: each device decodes its batch shard
    on-device (beam state never leaves the chip); outputs stay sharded
    over 'data' and host reads gather over ICI/DCN."""
    from ..ops import beam as beam_mod

    decoder = beam_mod.make_beam_decoder(
        beam_width=cfg.decode.beam_width, lm=lm,
        lm_weight=cfg.decode.lm_weight,
        word_bonus=cfg.decode.word_bonus)
    bsh = batch_sharding(mesh)

    def decode(logits, logit_lens):
        return decoder(logits, logit_lens)

    return jax.jit(decode, in_shardings=(bsh, bsh),
                   out_shardings=(bsh, bsh))

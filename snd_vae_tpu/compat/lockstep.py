"""Lockstep trajectory parity: train the LIVE TF reference and the JAX parity
model side by side and compare per-epoch ELBO trajectories.

This closes the last north-star clause ("ELBO within 1% of the TF reference")
at the *trajectory* level: point-wise parity (identical params -> identical
cost, tests/test_model_parity.py) composes here with K epochs of actual
optimization — TF1 ``tf.train.AdamOptimizer`` vs our matching formulation,
frozen BN, the reference's tile-skew feed stream, and shared
reparameterization noise.

Lockstep controls (everything that differs between the two stacks is pinned):

  * identical data: one GraphBatch with ``reproduce_pairing_skew`` samples; TF
    feeds are derived from the SAME arrays in the reference's b-major layout
    (main.py:307-323);
  * identical initial weights: the TF graph is initialized first, its
    variables mapped through ``map_reference_variables``;
  * identical reparameterization noise: the reference's three
    ``tf.random.normal`` draws (model.py:155-159, in s/sg/g call order) are
    patched into placeholders and fed the same numpy stream the JAX step
    consumes explicitly;
  * identical optimizer math: ``tf1_adam`` reproduces TF1 Adam's update
    ``lr·sqrt(1-b2^t)/(1-b1^t) · m/(sqrt(v)+eps)`` (epsilon OUTSIDE the bias
    correction — optax.adam corrects v before adding eps, a real trajectory
    difference at small |g|).

The reference loop fetched here mirrors main.py:301-353: contiguous batches,
cost fetched in the same ``sess.run`` as ``opt_op`` (pre-update forward),
per-epoch mean of per-batch costs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import Config
from ..data.graphbatch import GraphBatch


# --------------------------------------------------------------------------- #
# Noise stream                                                                #
# --------------------------------------------------------------------------- #

def make_noise_stream(
    seed: int, num_steps: int, shapes: Dict[str, Tuple[int, ...]]
) -> List[Dict[str, np.ndarray]]:
    """Per-step standard-normal draws for the three get_z branches.

    One fixed draw order (s, sg, g — the reference's get_z call order,
    model.py:155-159) so both stacks consume byte-identical noise."""
    rng = np.random.default_rng(seed)
    stream = []
    for _ in range(num_steps):
        stream.append(
            {k: rng.standard_normal(shapes[k]).astype(np.float32)
             for k in ("s", "sg", "g")}
        )
    return stream


# --------------------------------------------------------------------------- #
# TF side                                                                     #
# --------------------------------------------------------------------------- #

class _NoiseRecorder:
    """Stands in for the tf.random namespace during graph build: ``normal``
    returns a fresh placeholder (recorded in call order) instead of a random
    op; everything else delegates to the real tf.random."""

    def __init__(self, tf):
        self._tf = tf
        self.placeholders = []

    def normal(self, shape, *args, **kwargs):
        ph = self._tf.placeholder(self._tf.float32, shape)
        self.placeholders.append(ph)
        return ph

    def __getattr__(self, name):
        return getattr(self._tf.random, name)


def run_reference_trajectory(
    flags: Dict,
    data: GraphBatch,
    epochs: int,
    noise_stream: List[Dict[str, np.ndarray]],
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Train the live reference (its own model.py/optimizer.py, imported from
    /root/reference) for ``epochs`` with placeholder-fed reparameterization
    noise.  Returns (initial tf variables by name, per-step costs [E, nb]).

    The session loop replicates main.py:301-353: contiguous batches of B
    graphs (B*S sample rows), dropout/global_iter feeds, cost fetched with
    the update op."""
    from .ref_harness import restore_tensorflow_module

    # load_reference patches the global TF module (TF1 shim); restore it even
    # if the graph build or session loop raises, so a failure here cannot
    # poison later tests in the same process.
    try:
        return _run_reference_trajectory_patched(flags, data, epochs, noise_stream)
    finally:
        restore_tensorflow_module()


def _run_reference_trajectory_patched(
    flags: Dict,
    data: GraphBatch,
    epochs: int,
    noise_stream: List[Dict[str, np.ndarray]],
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    from .ref_harness import load_reference

    ref = load_reference(dict(flags))
    tf = ref.tf
    B = int(flags["batch_size"])
    S = int(flags["sampling_num"])
    G, N = data.batch_size, data.num_nodes
    F = data.features.shape[-1]
    D = data.coords.shape[-1]
    nb = G // B
    assert nb >= 1, "need at least one batch"
    assert data.feat_samples is not None and data.rel_samples is not None, (
        "lockstep requires the skewed sample stream "
        "(load with reproduce_pairing_skew=True)"
    )

    adj_truth = np.asarray(data.adj, np.float32)
    feats = np.asarray(data.features, np.float32)
    coords = np.asarray(data.coords, np.float32)
    rel = np.asarray(data.rel, np.float32)
    adj_s = np.asarray(data.adj_samples, np.float32).reshape(G * S, N, N)
    feat_s = np.asarray(data.feat_samples, np.float32).reshape(G * S, N, F)
    rel_s = np.asarray(data.rel_samples, np.float32).reshape(G * S, N, N, -1)
    # the tiled 'spatial' placeholder is wired into the graph but consumed by
    # no op in train mode (model.py uses spatial_truth via inputs_3d); feed
    # the per-graph repeat for completeness
    coords_s = np.repeat(coords, S, axis=0)

    recorder = None
    costs = np.zeros((epochs, nb), np.float64)
    with tf.Graph().as_default():
        placeholders = {
            "features": tf.placeholder(tf.float32, [B * S, N, F]),
            "spatial": tf.placeholder(tf.float32, [B * S, N, D]),
            "adj": tf.placeholder(tf.float32, [B * S, N, N]),
            "rel": tf.placeholder(tf.float32, [B * S, N, N, 1]),
            "adj_truth": tf.placeholder(tf.float32, [B, N, N]),
            "feature_truth": tf.placeholder(tf.float32, [B, N, F]),
            "spatial_truth": tf.placeholder(tf.float32, [B, N, D]),
            "rel_truth": tf.placeholder(tf.float32, [B, N, N, 1]),
            "dropout": tf.placeholder_with_default(0.0, shape=()),
            "global_iter": tf.placeholder_with_default(0.0, shape=()),
        }
        # encoder() multiplies sg_batch_size by sampling_num in place
        ref.FLAGS.sg_batch_size = B
        ref.FLAGS.sg_decoder_batch_size = B
        recorder = _NoiseRecorder(tf)
        ref.shim.random = recorder  # model.py's `tf` IS the shim module
        try:
            model = ref.model.SGCNModelVAE(placeholders, F, N)
        finally:
            del ref.shim.random  # restore __getattr__ delegation
        assert len(recorder.placeholders) == 3, (
            f"expected the 3 get_z draws, saw {len(recorder.placeholders)}"
        )
        eps_s_ph, eps_sg_ph, eps_g_ph = recorder.placeholders
        opt = ref.optimizer.OptimizerVAE(
            preds_edge=model.generated_adj_prob,
            preds_node=model.generated_node_feat,
            preds_spatial=model.generated_spatial,
            labels_edge=placeholders["adj_truth"],
            labels_node=placeholders["feature_truth"],
            labels_spatial=placeholders["spatial_truth"],
            labels_rel=placeholders["rel_truth"],
            global_iter=placeholders["global_iter"],
            model=model, num_nodes=N, pos_weight=1.0, norm=1.0,
            beta=float(flags.get("beta", 1.0)),
        )
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            tf_vars = {v.name: sess.run(v) for v in tf.global_variables()}
            step = 0
            for epoch in range(epochs):
                for i in range(nb):
                    lo, hi = i * B, (i + 1) * B
                    los, his = i * B * S, (i + 1) * B * S
                    eps = noise_stream[step]
                    feed = {
                        placeholders["features"]: feat_s[los:his],
                        placeholders["spatial"]: coords_s[los:his],
                        placeholders["adj"]: adj_s[los:his],
                        placeholders["rel"]: rel_s[los:his],
                        placeholders["adj_truth"]: adj_truth[lo:hi],
                        placeholders["feature_truth"]: feats[lo:hi],
                        placeholders["spatial_truth"]: coords[lo:hi],
                        placeholders["rel_truth"]: rel[lo:hi],
                        placeholders["dropout"]: float(flags.get("dropout", 1.0)),
                        placeholders["global_iter"]: float(epoch),
                        eps_s_ph: eps["s"],
                        eps_sg_ph: eps["sg"],
                        eps_g_ph: eps["g"],
                    }
                    _, cost = sess.run([opt.opt_op, opt.cost], feed)
                    costs[epoch, i] = cost
                    step += 1
    return tf_vars, costs


# --------------------------------------------------------------------------- #
# JAX side                                                                    #
# --------------------------------------------------------------------------- #

def _make_jax_lockstep_step(cfg: Config, model, optimizer):
    """One jit step with EXPLICIT reparameterization noise (the trainer's
    key-driven path is replaced by the shared stream)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..losses import elbo_loss
    from ..models.outputs import Latents, ModelOutput

    @jax.jit
    def step(params, opt_state, batch, eps_s, eps_sg, eps_g, global_iter):
        def loss_fn(p):
            stats = model.apply({"params": p}, batch, method=type(model).encode)
            latents = Latents(
                z_s=stats.mean_s + eps_s * jnp.exp(stats.logstd_s),
                z_sg=stats.mean_sg
                + eps_sg.reshape(stats.mean_sg.shape) * jnp.exp(stats.logstd_sg),
                z_g=stats.mean_g + eps_g * jnp.exp(stats.logstd_g),
            )
            decoded = model.apply(
                {"params": p}, latents, method=type(model).decode
            )
            out = ModelOutput(stats=stats, latents=latents, decoded=decoded)
            total, _ = elbo_loss(
                cfg, out, batch.adj, batch.features, batch.coords, global_iter
            )
            return total

        total, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    return step


def run_jax_trajectory(
    cfg: Config,
    params0,
    data: GraphBatch,
    epochs: int,
    noise_stream: List[Dict[str, np.ndarray]],
) -> np.ndarray:
    """Train the JAX parity model from ``params0`` on the same batch/noise
    stream with the TF-formulation Adam.  Returns per-step costs [E, nb]."""
    import jax.numpy as jnp

    from ..models import build_model
    from ..train import make_optimizer

    model = build_model(cfg)
    opt = make_optimizer(cfg.with_(train=dataclasses.replace(
        cfg.train, optimizer="tf1-adam")))
    opt_state = opt.init(params0)
    step_fn = _make_jax_lockstep_step(cfg, model, opt)
    B = cfg.train.batch_size
    nb = data.batch_size // B
    params = params0
    costs = np.zeros((epochs, nb), np.float64)
    step = 0
    for epoch in range(epochs):
        for i in range(nb):
            batch = data.slice_batch(i * B, B)
            eps = noise_stream[step]
            params, opt_state, total = step_fn(
                params, opt_state, batch,
                jnp.asarray(eps["s"]), jnp.asarray(eps["sg"]),
                jnp.asarray(eps["g"]), jnp.asarray(float(epoch)),
            )
            costs[epoch, i] = float(total)
            step += 1
    return costs


# --------------------------------------------------------------------------- #
# The experiment                                                              #
# --------------------------------------------------------------------------- #

@dataclasses.dataclass
class LockstepResult:
    tf_costs: np.ndarray    # [E, nb] per-step reference costs
    jax_costs: np.ndarray   # [E, nb] per-step parity-mode costs
    tf_epoch: np.ndarray    # [E] per-epoch means (the reference's logged stat)
    jax_epoch: np.ndarray
    max_epoch_rel_gap: float
    final_epoch_rel_gap: float


def run_lockstep(
    cfg: Config,
    flags: Dict,
    data: GraphBatch,
    epochs: int,
    noise_seed: int = 0,
) -> LockstepResult:
    """The full lockstep experiment (VERDICT r2 item 1).

    ``cfg`` must be the parity-mode twin of ``flags`` (same architecture,
    float32, reproduce_pairing_skew data).  TF trains first (its init
    variables seed the JAX side), then JAX replays the identical stream."""
    B = cfg.train.batch_size
    S = cfg.sampling_num
    nb = data.batch_size // B
    enc = cfg.encoder
    shapes = {
        "s": (B, enc.s_latent_size),
        "sg": (B * S, enc.sg_latent_size),
        "g": (B, enc.g_latent_size),
    }
    noise = make_noise_stream(noise_seed, epochs * nb, shapes)
    tf_vars, tf_costs = run_reference_trajectory(flags, data, epochs, noise)

    from .tf_import import map_reference_variables

    params0 = map_reference_variables(tf_vars, cfg)
    jax_costs = run_jax_trajectory(cfg, params0, data, epochs, noise)

    tf_epoch = tf_costs.mean(axis=1)
    jax_epoch = jax_costs.mean(axis=1)
    rel = np.abs(jax_epoch - tf_epoch) / np.maximum(np.abs(tf_epoch), 1e-12)
    return LockstepResult(
        tf_costs=tf_costs,
        jax_costs=jax_costs,
        tf_epoch=tf_epoch,
        jax_epoch=jax_epoch,
        max_epoch_rel_gap=float(rel.max()),
        final_epoch_rel_gap=float(rel[-1]),
    )

"""Training loop: jit-compiled train step + epoch driver.

Rebuilds the reference's session loop (main.py:283-356) TPU-natively:

  * the whole update — forward, ELBO, backward, Adam — is ONE jit-compiled
    XLA computation with donated state (vs. per-step feed_dict host->device
    copies at main.py:327-331);
  * data stays on device across the epoch; contiguous batch slicing matches
    main.py:315-323;
  * per-batch edge accuracy (main.py:334) is computed in-graph;
  * Orbax checkpoints every ``checkpoint_every`` epochs with optimizer state
    and PRNG key (vs. tf.train.Saver at main.py:351-352);
  * metrics go through the LossesLogger equivalent (main.py:278-280,353).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from .checkpoint import Checkpointer
from .config import Config
from .data.graphbatch import GraphBatch
from .losses import elbo_loss
from .models import build_model
from .parallel import mesh as pmesh
from .utils.logging import LossesLogger
from .utils.tree import cast_float_leaves


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    key: jax.Array


def tf1_adam(
    learning_rate: float, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Adam in TF1's exact formulation (tf.train.AdamOptimizer, the
    reference's optimizer at optimizer.py:125):

        lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
        w   -= lr_t * m_t / (sqrt(v_t) + eps)

    optax.adam instead bias-corrects v BEFORE adding eps
    (m_hat / (sqrt(v_hat) + eps)); the two differ by an effective
    eps factor sqrt(1 - b2^t) — a real trajectory difference wherever
    sqrt(v) ~ eps (tiny/zero-gradient parameters).  Used by the lockstep
    trajectory-parity harness (compat/lockstep.py) and selectable via
    ``TrainConfig.optimizer = "tf1-adam"``."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return (jnp.zeros((), jnp.int32), zeros, jax.tree.map(jnp.zeros_like, zeros))

    def update(grads, state, params=None):
        del params
        t, m, v = state
        t = t + 1
        m = jax.tree.map(lambda mu, g: b1 * mu + (1 - b1) * g, m, grads)
        v = jax.tree.map(lambda nu, g: b2 * nu + (1 - b2) * g * g, v, grads)
        tf_ = t.astype(jnp.float32)
        lr_t = learning_rate * jnp.sqrt(1 - b2 ** tf_) / (1 - b1 ** tf_)
        updates = jax.tree.map(
            lambda mu, nu: -lr_t * mu / (jnp.sqrt(nu) + eps), m, v
        )
        return updates, (t, m, v)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Adam with the reference's hyperparameters (optimizer.py:125: TF1
    AdamOptimizer defaults beta1=0.9, beta2=0.999, eps=1e-8).
    ``cfg.train.optimizer`` picks the formulation: "adam" (optax default)
    or "tf1-adam" (the reference's exact epsilon placement, see tf1_adam)."""
    name = cfg.train.optimizer
    if name == "tf1-adam":
        return tf1_adam(cfg.train.learning_rate)
    if name == "adam":
        return optax.adam(cfg.train.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    raise ValueError(f"unknown TrainConfig.optimizer {name!r}")


def init_state(cfg: Config, batch: GraphBatch, seed: Optional[int] = None) -> Tuple[Any, TrainState]:
    model = build_model(cfg)
    key = jax.random.PRNGKey(cfg.train.seed if seed is None else seed)
    k_init, k_state = jax.random.split(key)
    small = batch.slice_batch(0, min(2, batch.batch_size))
    variables = model.init(k_init, small, key=k_init)
    params = variables["params"]
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    return model, TrainState(
        params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32), key=k_state
    )



def _compute_cast(cfg: Config, params, batch: GraphBatch):
    """Mixed precision: cast float params and batch tensors to the configured
    compute dtype (bfloat16 on TPU halves HBM traffic; master params stay
    float32 in the optimizer).  Identity when compute_dtype is float32."""
    cd = jnp.dtype(cfg.compute_dtype)
    if cd == jnp.float32:
        return params, batch
    return cast_float_leaves(params, cd), cast_float_leaves(batch, cd)


def make_train_step(
    cfg: Config, model, optimizer: optax.GradientTransformation
) -> Callable:
    """One fused update; state is donated so buffers update in place."""

    def train_step(state: TrainState, batch: GraphBatch, global_iter: jax.Array):
        key, step_key = jax.random.split(state.key)

        def loss_fn(params):
            params_c, batch_c = _compute_cast(cfg, params, batch)
            out = model.apply(
                {"params": params_c}, batch_c, key=step_key,
                dropout_keep=cfg.train.dropout_keep_prob,
            )
            total, aux = elbo_loss(
                cfg, out, batch.adj, batch.features, batch.coords, global_iter,
                node_mask=batch.node_mask,
            )
            # in-graph edge accuracy vs truth (main.py:334)
            acc = jnp.mean((out.decoded.adj == batch.adj).astype(jnp.float32))
            aux["adj_acc"] = acc
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1, key=key
        )
        return new_state, aux

    return jax.jit(train_step, donate_argnums=(0,))


def _make_scan_body(cfg: Config, model, optimizer: optax.GradientTransformation):
    """The shared scan body: one optimization step over one [B,...] batch."""

    def one_step(carry, batch):
        state, nb = carry
        # epoch number derived ON DEVICE from the step counter — feeding a
        # fresh host scalar per epoch costs a ~75 ms host->device transfer
        # on a tunneled TPU, ~2x the epoch's device compute
        global_iter = jnp.floor_divide(state.step, nb).astype(jnp.float32)
        key, step_key = jax.random.split(state.key)

        def loss_fn(params):
            params_c, batch_c = _compute_cast(cfg, params, batch)
            out = model.apply(
                {"params": params_c}, batch_c, key=step_key,
                dropout_keep=cfg.train.dropout_keep_prob,
            )
            total, aux = elbo_loss(
                cfg, out, batch.adj, batch.features, batch.coords, global_iter,
                node_mask=batch.node_mask,
            )
            acc = jnp.mean((out.decoded.adj == batch.adj).astype(jnp.float32))
            aux["adj_acc"] = acc
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1, key=key
        )
        return (new_state, nb), aux

    return one_step


def _maybe_reshuffle(cfg: Config, state: TrainState, batched: GraphBatch) -> GraphBatch:
    """Corrected-mode per-epoch reshuffle (cfg.train.reshuffle): re-permute
    the graph->batch assignment on device.  Identity in parity mode — the
    reference trains on fixed contiguous batches (main.py:315-323)."""
    if not cfg.train.reshuffle:
        return batched
    nb, b = batched.adj.shape[:2]
    perm = jax.random.permutation(jax.random.fold_in(state.key, 17), nb * b)

    def shuf(x):
        if x is None:
            return None
        flat = x.reshape((nb * b,) + x.shape[2:])
        return flat[perm].reshape(x.shape)

    return jax.tree.map(shuf, batched)


def make_epoch_step(
    cfg: Config, model, optimizer: optax.GradientTransformation
) -> Callable:
    """One jit-compiled EPOCH: lax.scan over the pre-batched dataset.

    The reference pays a feed_dict round-trip and a Python fetch per batch
    (main.py:315-353); the per-step jit above still pays one dispatch + aux
    fetch per batch.  Scanning the batch axis on device leaves exactly one
    host sync per epoch — data of shape [num_batches, B, ...] stays resident
    and XLA pipelines the whole epoch."""
    one_step = _make_scan_body(cfg, model, optimizer)

    def epoch_step(state: TrainState, batched: GraphBatch):
        nb = jnp.asarray(batched.adj.shape[0], jnp.int32)
        batched = _maybe_reshuffle(cfg, state, batched)
        (state, _), aux = jax.lax.scan(
            one_step, (state, nb), batched, unroll=cfg.train.scan_unroll
        )
        return state, aux  # aux leaves have a leading [num_batches] axis

    return jax.jit(epoch_step, donate_argnums=(0,))


def make_multi_epoch_step(
    cfg: Config, model, optimizer: optax.GradientTransformation
) -> Callable:
    """A jit-compiled CHUNK of epochs: lax.scan over epochs around the
    per-epoch batch scan.

    On the tunneled chip a host fetch round-trip costs ~50-100 ms — more
    than the whole epoch's device compute (~43 ms f32 / ~23 ms bf16 at the
    reference operating point) — so the per-epoch fetch dominates the epoch
    scan.  Scanning E epochs per dispatch amortizes it to 1/E.  Per-epoch
    loss means are reduced on device, so the host transfer stays one small
    [E, ...] pytree per chunk.  NOTE: on this backend only a value fetch
    (device_get) fences execution; block_until_ready resolves early
    (BASELINE.md "Timing-fence pitfall").

    Returns ``fn(state, batched, num_epochs)`` (num_epochs static)."""
    one_step = _make_scan_body(cfg, model, optimizer)

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(2,))
    def multi_epoch_step(state: TrainState, batched: GraphBatch, num_epochs: int):
        nb = jnp.asarray(batched.adj.shape[0], jnp.int32)

        def epoch_body(st, _):
            shuffled = _maybe_reshuffle(cfg, st, batched)
            (st, _), aux = jax.lax.scan(
                one_step, (st, nb), shuffled, unroll=cfg.train.scan_unroll
            )
            return st, jax.tree.map(lambda a: jnp.mean(a, axis=0), aux)

        state, means = jax.lax.scan(epoch_body, state, None, length=num_epochs)
        return state, means  # aux leaves have a leading [num_epochs] axis

    return multi_epoch_step


def rebatch(data: GraphBatch, batch_size: int) -> GraphBatch:
    """[G, ...] -> [G//B, B, ...] contiguous batches (drops the remainder,
    like the reference's int(G/B) loop at main.py:312)."""
    nb = data.batch_size // batch_size

    def fold(x):
        if x is None:
            return None
        return x[: nb * batch_size].reshape((nb, batch_size) + x.shape[1:])

    return GraphBatch(
        adj=fold(data.adj),
        features=fold(data.features),
        coords=fold(data.coords),
        rel=fold(data.rel),
        adj_samples=fold(data.adj_samples),
        factors=fold(data.factors),
        node_mask=fold(data.node_mask),
        feat_samples=fold(data.feat_samples),
        rel_samples=fold(data.rel_samples),
    )


def make_eval_step(cfg: Config, model) -> Callable:
    """Posterior-mean reconstruction (reference generate_new_train,
    main.py:358-362)."""

    def eval_step(params, batch: GraphBatch):
        out = model.apply(
            {"params": params}, batch, key=jax.random.PRNGKey(0), deterministic_z=True
        )
        return out

    return jax.jit(eval_step)


def make_generate_step(cfg: Config, model) -> Callable:
    """Decode from the prior (reference test_generation graph,
    model.py:83-85)."""

    def gen_step(params, key, num: int):
        return model.apply(
            {"params": params}, key, num, method=type(model).generate
        )

    return jax.jit(gen_step, static_argnums=(2,))


class _GracefulStop:
    """SIGTERM/SIGINT trap: training finishes the current epoch/chunk, saves
    a checkpoint, and returns cleanly instead of dying mid-step.  The
    reference loses up to 100 epochs on any interruption (checkpoint cadence,
    main.py:351; SURVEY §5 names failure recovery as a gap to fill).  Only
    installed on the main thread; restores prior handlers on exit."""

    def __init__(self):
        self.stop = False
        self._prev = {}

    def _handler(self, signum, frame):
        self.stop = True

    def __enter__(self):
        import signal
        import threading

        if threading.current_thread() is threading.main_thread():
            for s in (signal.SIGTERM, signal.SIGINT):
                self._prev[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        import signal

        for s, h in self._prev.items():
            signal.signal(s, h)
        return False


class Trainer:
    """Epoch driver mirroring main.py's train body (main.py:300-356)."""

    def __init__(
        self,
        cfg: Config,
        train_batch: GraphBatch,
        mesh: Optional[Mesh] = None,
        workdir: str = ".",
        eval_batch: Optional[GraphBatch] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        self.workdir = workdir
        if mesh is not None:
            train_batch = pmesh.shard_graphbatch(train_batch, mesh)
        self.data = train_batch
        self.model, self.state = init_state(cfg, train_batch)
        if mesh is not None:
            self.state = TrainState(
                params=pmesh.shard_params(self.state.params, mesh),
                opt_state=pmesh.shard_params(self.state.opt_state, mesh),
                step=self.state.step,
                key=self.state.key,
            )
        self.optimizer = make_optimizer(cfg)
        self.train_step = make_train_step(cfg, self.model, self.optimizer)
        self.epoch_step = make_epoch_step(cfg, self.model, self.optimizer)
        self.multi_epoch_step = make_multi_epoch_step(cfg, self.model, self.optimizer)
        self.batched = rebatch(self.data, cfg.train.batch_size)
        log_path = os.path.join(
            workdir,
            cfg.train.log_dir,
            f"train_loss_{cfg.dataset}_{cfg.model_type}.txt",
        )
        self.logger = LossesLogger(log_path)
        self.checkpointer = Checkpointer(
            os.path.join(workdir, cfg.train.checkpoint_dir,
                         f"{cfg.dataset}_{cfg.model_type}")
        )
        # epoch of the spanning-tree draw currently in effect (0 = load-time)
        self._tree_boundary = 0
        # held-out evaluation + best-checkpoint tracking (cfg.train.eval_every)
        self.eval_batch = eval_batch
        self._eval_step = None
        self._best_ckpt: Optional[Checkpointer] = None
        self._best_value: Optional[float] = None
        if cfg.train.eval_every > 0 and eval_batch is not None:
            best_dir = os.path.join(
                workdir, cfg.train.checkpoint_dir,
                f"{cfg.dataset}_{cfg.model_type}_best",
            )
            self._best_ckpt = Checkpointer(best_dir, max_to_keep=1)
            self._best_path = os.path.join(best_dir, "best.json")
            if os.path.exists(self._best_path):
                import json

                with open(self._best_path) as f:
                    self._best_value = float(json.load(f)["value"])
            eval_log = os.path.join(
                workdir, cfg.train.log_dir,
                f"val_loss_{cfg.dataset}_{cfg.model_type}.txt",
            )
            self.eval_logger = LossesLogger(eval_log)

    def _mesh_scope(self):
        """Ambient-mesh context for dispatches: activates the in-model node-
        sharding hints (parallel/hints.py) when training over a mesh;
        nullcontext single-device."""
        from contextlib import nullcontext

        return jax.set_mesh(self.mesh) if self.mesh is not None else nullcontext()

    def _maybe_resample_trees(self, epoch: int) -> None:
        """Corrected-mode augmentation (cfg.train.resample_trees_every): at
        every k-th epoch boundary, re-draw the spanning-tree samples from the
        ORIGINAL adjacencies on the host (keyed by seed+boundary) and push
        them to the device.  The reference freezes its trees at load time
        (input_data.py:70-83); identity when k<=0 (parity).

        Keyed by the *boundary* epoch ``(epoch // k) * k`` rather than by
        ``epoch % k == 0`` so that resuming mid-interval (e.g. a restart at
        epoch 73 with k=50) deterministically reconstructs the epoch-50 draw
        instead of silently training on the load-time trees until epoch 100."""
        k = self.cfg.train.resample_trees_every
        if k <= 0 or self.data.adj_samples is None:
            return
        boundary = (epoch // k) * k
        if boundary == 0 or boundary == self._tree_boundary:
            return
        from .data.spanning_tree import sample_spanning_trees

        new = sample_spanning_trees(
            np.asarray(self.data.adj),
            self.data.adj_samples.shape[1],
            seed=self.cfg.train.seed + boundary,
        )
        self._tree_boundary = boundary
        self.data = self.data.replace(
            adj_samples=jnp.asarray(new, self.data.adj_samples.dtype)
        )
        if self.mesh is not None:
            self.data = pmesh.shard_graphbatch(self.data, self.mesh)
        self.batched = rebatch(self.data, self.cfg.train.batch_size)

    def evaluate_heldout(self) -> Dict[str, float]:
        """Posterior-mean reconstruction metrics on the held-out batch.

        The reference only ever scores checkpoints in separate
        test_reconstruct processes (main.py:374-426); this runs the same
        metrics in-training so quality is observable without stopping.
        Decodes in train-batch-size slices (one compiled program, bounded
        dispatches) and computes edge AUC/AP/F1 + MSEs host-side."""
        from .evaluate import reconstruct_evaluation

        if self._eval_step is None:
            self._eval_step = make_eval_step(self.cfg, self.model)
        B = self.cfg.train.batch_size
        G = self.eval_batch.batch_size
        outs = []
        for i in range(max(G // B, 1)):
            b = self.eval_batch.slice_batch(i * B, B)
            outs.append(jax.device_get(
                self._eval_step(self.state.params, b).decoded
            ))
        gen_adj = np.concatenate([np.asarray(o.adj) for o in outs])
        gen_nodes = np.concatenate([np.asarray(o.node_feat) for o in outs])
        gen_spatial = np.concatenate([np.asarray(o.coords) for o in outs])
        from .evaluate import edge_presence_scores

        adj_scores = np.concatenate([edge_presence_scores(o.adj_prob) for o in outs])
        n = len(gen_adj)
        return reconstruct_evaluation(
            gen_adj, gen_nodes, gen_spatial,
            np.asarray(self.eval_batch.adj)[:n],
            np.asarray(self.eval_batch.features)[:n],
            np.asarray(self.eval_batch.coords)[:n],
            self.cfg.dataset, adj_scores=adj_scores,
            node_categorical=outs[0].node_feat_prob is not None,
        )

    def _maybe_eval(self, epoch: int, verbose: bool) -> None:
        """Held-out eval at the cfg.train.eval_every cadence; saves the best
        checkpoint (by cfg.train.best_metric) with its score in best.json so
        resume keeps comparing against the all-time best."""
        k = self.cfg.train.eval_every
        if k <= 0 or self.eval_batch is None or epoch <= 0 or epoch % k != 0:
            return
        metrics = self.evaluate_heldout()
        self.eval_logger.log(epoch, {f"val_{n}": [v] for n, v in metrics.items()})
        name = self.cfg.train.best_metric
        sign = -1.0 if name.startswith("-") else 1.0
        key = name.lstrip("-")
        if key not in metrics:
            if verbose:
                print(f"eval: best_metric {key!r} not in {sorted(metrics)}; "
                      "skipping best tracking")
            return
        score = sign * metrics[key]
        if verbose:
            print(f"Epoch: {epoch + 1:04d} val_{key}= {metrics[key]:.5f}"
                  + (f" (best {sign * self._best_value:.5f})"
                     if self._best_value is not None else ""))
        if self._best_value is None or score > self._best_value:
            self._best_value = score
            self._best_ckpt.save(epoch, self.state)
            import json

            with open(self._best_path, "w") as f:
                json.dump({"epoch": epoch, "metric": key,
                           "value": score, "raw": metrics[key]}, f)

    def maybe_restore(self) -> int:
        """Resume from the latest checkpoint if one exists; returns the
        starting epoch.  A checkpoint saved at epoch e holds the state AFTER
        e's updates, so training resumes at e+1 (re-training e would fork the
        trajectory and duplicate its log row)."""
        step = self.checkpointer.latest_step()
        if step is None:
            return 0
        self.state = self.checkpointer.restore(self.state, step)
        return int(step) + 1

    def run(
        self,
        epochs: Optional[int] = None,
        verbose: bool = True,
        per_step: bool = False,
        profile_dir: Optional[str] = None,
        epoch_chunk: int = 1,
    ) -> Dict[str, float]:
        """Train.  Default path scans whole epochs on device (one host sync
        per epoch); ``per_step=True`` falls back to one dispatch per batch
        (the reference's loop granularity, main.py:315-353);
        ``epoch_chunk=E>1`` scans E epochs per dispatch (amortizes the
        ~50-100 ms per-fetch tunnel round-trip; chunks never cross a checkpoint
        boundary, so save/log semantics match the per-epoch path).

        ``profile_dir`` captures a jax.profiler device trace of the second
        epoch (the first is compile) — the observability the reference lacks
        (SURVEY §5: wall-clock prints only, main.py:348-350)."""
        if epoch_chunk > 1 and not per_step and profile_dir is None:
            return self._run_chunked(epochs, verbose, epoch_chunk)
        cfg = self.cfg
        epochs = cfg.train.epochs if epochs is None else epochs
        prof_epoch = 1 if epochs > 1 else 0
        B = cfg.train.batch_size
        G = self.data.batch_size
        batch_num = max(G // B, 1)
        last_means: Dict[str, float] = {}
        start = self.maybe_restore()
        stopper = _GracefulStop().__enter__()
        try:
            for epoch in range(start, epochs):
                self._maybe_resample_trees(epoch)
                if profile_dir is not None and epoch == prof_epoch:
                    jax.profiler.start_trace(profile_dir)
                epoch_time = time.time()
                if per_step:
                    storer = defaultdict(list)
                    for i in range(batch_num):
                        batch = self.data.slice_batch(i * B, B)
                        t = time.time()
                        with self._mesh_scope():
                            self.state, aux = self.train_step(
                                self.state, batch, jnp.asarray(epoch, jnp.float32)
                            )
                        for k, v in aux.items():
                            storer[k].append(float(v))
                        if verbose:
                            print(
                                f"Epoch: {epoch + 1:04d} loss= {storer['loss'][-1]:.5f} "
                                f"time= {time.time() - t:.5f}"
                            )
                else:
                    with self._mesh_scope():
                        self.state, aux = self.epoch_step(self.state, self.batched)
                    aux = jax.device_get(aux)  # one sync per epoch
                    storer = {k: list(np.asarray(v)) for k, v in aux.items()}
                    if verbose:
                        print(
                            f"Epoch: {epoch + 1:04d} loss= "
                            f"{float(np.mean(storer['loss'])):.5f}"
                        )
                if profile_dir is not None and epoch == prof_epoch:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                if verbose:
                    print(f"epoch time= {time.time() - epoch_time:.5f}")
                if epoch % cfg.train.checkpoint_every == 0:
                    self.checkpointer.save(epoch, self.state)
                self._maybe_eval(epoch, verbose)
                last_means = self.logger.log(epoch, storer)
                if stopper.stop:
                    self.checkpointer.save(epoch, self.state)
                    if verbose:
                        print(f"interrupted: checkpointed epoch {epoch}")
                    break
        finally:
            stopper.__exit__()
        return last_means

    def _run_chunked(
        self, epochs: Optional[int], verbose: bool, epoch_chunk: int
    ) -> Dict[str, float]:
        """Multi-epoch-scan path: one dispatch per chunk of epochs.  Chunks
        stop right after a checkpoint-cadence epoch so saves land on the same
        epochs as the per-epoch path."""
        cfg = self.cfg
        epochs = cfg.train.epochs if epochs is None else epochs
        every = max(cfg.train.checkpoint_every, 1)
        last_means: Dict[str, float] = {}
        epoch = self.maybe_restore()
        stopper = _GracefulStop().__enter__()
        # best (smallest) observed per-epoch wall seconds; compile-inflated
        # first dispatches only make the guard conservative
        per_epoch_est: Optional[float] = None
        try:
            while epoch < epochs:
                # next cadence epoch at or after `epoch`; chunk must end at cad+1
                cad = epoch + ((every - epoch % every) % every)
                want = epoch_chunk
                if per_epoch_est is None and cfg.train.max_dispatch_s > 0:
                    # no timing estimate yet (fresh run or resume): the first
                    # dispatch must not gamble against the worker's dispatch
                    # tolerance, so probe with a single epoch.  Fresh runs hit
                    # this anyway via the epoch-0 cadence boundary; resumes
                    # (e.g. epoch 1, checkpoint_every=100) would otherwise
                    # dispatch up to ~100 epochs blind.
                    want = 1
                if per_epoch_est is not None and cfg.train.max_dispatch_s > 0:
                    # keep one dispatch under the worker's tolerance
                    # (BASELINE.md: >~60 s dispatches crash the tunneled TPU)
                    cap = max(1, int(cfg.train.max_dispatch_s / per_epoch_est))
                    if cap < want and verbose:
                        print(f"epoch_chunk capped {want}->{cap} "
                              f"(~{per_epoch_est:.2f}s/epoch, "
                              f"max_dispatch_s={cfg.train.max_dispatch_s})")
                    want = min(want, cap)
                stop = min(epochs, epoch + want, cad + 1)
                ek = cfg.train.eval_every
                if ek > 0 and self.eval_batch is not None:
                    # chunks must also end right after an eval-cadence epoch
                    # so the state at that epoch is live for scoring
                    ecad = epoch + ((ek - epoch % ek) % ek)
                    stop = min(stop, ecad + 1)
                rk = cfg.train.resample_trees_every
                if rk > 0:
                    # chunks must not cross a resampling boundary
                    stop = min(stop, (epoch // rk + 1) * rk)
                    self._maybe_resample_trees(epoch)
                n = stop - epoch
                t0 = time.time()
                if n == 1:
                    # reuse the epoch program instead of compiling a one-epoch
                    # multi-epoch scan (fresh runs always start with an n=1
                    # chunk at the epoch-0 cadence boundary; the extra
                    # whole-program compile costs minutes on a remote chip)
                    with self._mesh_scope():
                        self.state, aux = self.epoch_step(self.state, self.batched)
                    aux = jax.device_get(aux)  # [num_batches, ...] leaves
                    means = {k: np.mean(np.asarray(v), axis=0, keepdims=True)
                             for k, v in aux.items()}
                else:
                    with self._mesh_scope():
                        self.state, means = self.multi_epoch_step(
                            self.state, self.batched, n
                        )
                    means = jax.device_get(means)  # one sync, [n, ...] leaves
                dt = time.time() - t0
                per_epoch = dt / n
                if per_epoch_est is None or per_epoch < per_epoch_est:
                    per_epoch_est = per_epoch
                for i in range(n):
                    row = {k: [float(np.asarray(v)[i])] for k, v in means.items()}
                    last_means = self.logger.log(epoch + i, row)
                if verbose:
                    print(
                        f"Epoch: {stop:04d} loss= {last_means['loss']:.5f} "
                        f"chunk({n})/time= {dt:.5f}"
                    )
                epoch = stop
                if (epoch - 1) % every == 0:
                    self.checkpointer.save(epoch - 1, self.state)
                elif stopper.stop:
                    self.checkpointer.save(epoch - 1, self.state)
                self._maybe_eval(epoch - 1, verbose)
                if stopper.stop:
                    if verbose:
                        print(f"interrupted: checkpointed epoch {epoch - 1}")
                    break
        finally:
            stopper.__exit__()
        return last_means

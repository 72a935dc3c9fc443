"""TF1 harness for the reference implementation at /root/reference.

Loads the reference's own ``model.py``/``optimizer.py``/``layers.py`` under a
TF1 compatibility shim so they can be executed for baseline measurement
(benchmarks/tf_reference_baseline.py) and model-level parity tests
(tests/test_model_parity.py).  Two reference dependencies that no longer
exist in the installed TF2/Keras-3 runtime are shimmed with semantically
identical TF1-style implementations:

  * ``tf.layers.conv1d``  -> glorot-uniform kernel + zero bias SAME conv
    (what tf.layers.conv1d created in TF1), variables named
    ``<scope>/kernel`` / ``<scope>/bias``;
  * ``tf.keras.layers.BatchNormalization`` -> frozen-at-init-stats affine
    (exactly what the reference's untrained-flag BN computes in TF1 graph
    mode, SURVEY §7 quirk 3), variables ``<name>/gamma`` / ``<name>/beta``.

Nothing from the reference is copied; its modules are imported in place.
"""

from __future__ import annotations

import sys
import types
from typing import Dict, Optional

import numpy as np

_loaded = None


def load_reference(overrides: Optional[Dict] = None):
    """Import the reference modules (once per process) with synthetic2-preset
    flags, optionally overridden.  Returns a namespace with ``tf``, ``model``
    (module), ``optimizer`` (module), ``layers`` (module), ``FLAGS``."""
    global _loaded
    if _loaded is not None:
        if overrides:
            for k, v in overrides.items():
                setattr(_loaded.FLAGS, k, v)
        return _loaded

    import tensorflow.compat.v1 as tf

    tf.disable_v2_behavior()

    def _conv1d(inputs, filters, kernel_size, strides=1, name=None, padding="SAME"):
        with tf.variable_scope(name, default_name="conv1d"):
            k = int(kernel_size)
            cin = int(inputs.shape[-1])
            w = tf.get_variable(
                "kernel", [k, cin, int(filters)],
                initializer=tf.glorot_uniform_initializer(),
            )
            b = tf.get_variable(
                "bias", [int(filters)], initializer=tf.zeros_initializer()
            )
            out = tf.nn.conv1d(
                inputs, w, stride=int(strides), padding=str(padding).upper()
            )
            return out + b

    class _FrozenBN:
        _uid = [0]

        def __init__(self, name=None, **kw):
            if name is None:
                self._uid[0] += 1
                name = f"bn_{self._uid[0]}"
            self.name = name

        def __call__(self, x, training=None):
            c = int(x.shape[-1])
            with tf.variable_scope(self.name, reuse=tf.AUTO_REUSE):
                gamma = tf.get_variable("gamma", [c], initializer=tf.ones_initializer())
                beta = tf.get_variable("beta", [c], initializer=tf.zeros_initializer())
            return x * gamma * (1.0 / np.sqrt(1.0 + 1e-3)) + beta

    import importlib.machinery

    shim = types.ModuleType("tensorflow")
    shim.__getattr__ = lambda name: getattr(tf, name)
    shim.__spec__ = importlib.machinery.ModuleSpec("tensorflow", loader=None)
    shim.layers = types.SimpleNamespace(conv1d=_conv1d)
    shim.keras = types.SimpleNamespace(
        layers=types.SimpleNamespace(BatchNormalization=_FrozenBN)
    )
    original_tf = sys.modules.get("tensorflow")
    sys.modules["tensorflow"] = shim

    # model_joint.py imports tensorflow.compat.v1 DIRECTLY (model_joint.py:2),
    # bypassing the top-level shim, so shim that module path too: same
    # delegation, with the TF1-style layers.conv1d and frozen keras BN that
    # Keras 3 removed.
    shim_v1 = types.ModuleType("tensorflow.compat.v1")
    shim_v1.__getattr__ = lambda name: getattr(tf, name)
    shim_v1.__spec__ = importlib.machinery.ModuleSpec(
        "tensorflow.compat.v1", loader=None
    )
    shim_v1.layers = shim.layers
    shim_v1.keras = shim.keras
    original_tf_v1 = sys.modules.get("tensorflow.compat.v1")
    sys.modules["tensorflow.compat.v1"] = shim_v1
    # `import tensorflow.compat.v1 as tf` binds via attribute access on the
    # parent modules, so the chain must resolve to shim_v1 explicitly (the
    # shim's __getattr__ delegation would land on the real module)
    shim.compat = types.SimpleNamespace(v1=shim_v1)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    flags = tf.app.flags
    FLAGS = flags.FLAGS
    defaults = {
        # synthetic2 preset (reference main.py:39-103 defaults overridden per
        # main.py:181-217)
        "spatial_conv_layers": 3,
        "s_channel": [10, 10, 20],
        "s_kernel_size": [5, 5, 5],
        "s_strides": [1, 1, 1],
        "s_hidden_size": 100,
        "s_latent_size": 100,
        "graph_conv_layers": 2,
        "g_conv_hidden": [10, 20],
        "g_hidden_size": 100,
        "g_latent_size": 100,
        "spatial_graph_conv_layers": 2,
        "sg_conv_hidden": [[20, 20, 20], [50, 50, 50]],
        "sg_hidden_size": 100,
        "sg_latent_size": 100,
        "spatial_deconv_layers": 3,
        "s_d_channel": [50, 20, 10],
        "s_d_kernel_size": [5, 5, 5],
        "s_d_strides": [1, 1, 1],
        "graph_deconv_layers": 2,
        "n_d_channel": [50, 20, 10],
        "n_d_kernel_size": [5, 5, 5],
        "n_d_strides": [1, 1, 1],
        "d_hidden_size": 20,
        "e_d_hidden": [50, 20, 10],
        "node_h_size": 20,
        "model_type": "disentangled",
        "learning_rate": 0.0008,
        "dropout": 1.0,
        "batch_size": 10,
        "decoder_batch_size": 10,
        "sg_batch_size": 10,
        "sg_decoder_batch_size": 10,
        "num_feature": 1,
        "spatial_dim": 2,
        "type": "train",
        "dataset": "synthetic2",
        "sampling_num": 10,
        # read unconditionally by model_joint.py:171 but never DEFINEd in the
        # reference (SURVEY §2.5) — the base model requires it to exist
        "num_edge_feature": 2,
    }
    for k, v in defaults.items():
        if k in FLAGS:
            continue
        if isinstance(v, bool):
            flags.DEFINE_boolean(k, v, "")
        elif isinstance(v, int):
            flags.DEFINE_integer(k, v, "")
        elif isinstance(v, float):
            flags.DEFINE_float(k, v, "")
        elif isinstance(v, list):
            flags.DEFINE_list(k, [], "")
        else:
            flags.DEFINE_string(k, v, "")
    try:
        FLAGS.mark_as_parsed()
    except Exception:
        pass
    for k, v in defaults.items():
        setattr(FLAGS, k, v)
    if overrides:
        for k, v in overrides.items():
            setattr(FLAGS, k, v)

    import layers as ref_layers  # noqa: E402
    import model as ref_model  # noqa: E402
    import model_joint as ref_model_joint  # noqa: E402
    import optimizer as ref_optimizer  # noqa: E402

    _loaded = types.SimpleNamespace(
        tf=tf,
        shim=shim,
        original_tf=original_tf,
        original_tf_v1=original_tf_v1,
        FLAGS=FLAGS,
        layers=ref_layers,
        model=ref_model,
        model_joint=ref_model_joint,
        optimizer=ref_optimizer,
    )
    return _loaded


def restore_tensorflow_module():
    """Put the real tensorflow module back in sys.modules (for code that
    probes importlib specs, e.g. orbax)."""
    if _loaded is not None and _loaded.original_tf is not None:
        sys.modules["tensorflow"] = _loaded.original_tf
    if _loaded is not None and getattr(_loaded, "original_tf_v1", None) is not None:
        sys.modules["tensorflow.compat.v1"] = _loaded.original_tf_v1

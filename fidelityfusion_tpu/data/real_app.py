"""Real-application BO objectives: neural-network training accuracy vs
hyperparameters, with training epochs as the fidelity.

TPU-native re-design of `Data_simulation/Real_Application/
{cnn_cifar10,mln_mnist}.py:47-117`: the reference trains a torch-lightning
CNN on CIFAR-100 / an MLP on MNIST and returns validation accuracy as the
BO objective (fidelity = number of epochs).  This environment has no
dataset DOWNLOADS, so:

* `DigitsMLPObjective` trains on a REAL dataset — scikit-learn's bundled
  handwritten-digits images (1797 x 8x8, 10 classes, shipped inside the
  sklearn package, no network) — the closest offline analog of the
  reference's MNIST MLP objective (`mln_mnist.py:47-90`), with the same
  hyperparameters (dropout rate, learning rate) and fidelity = epochs.
* `MLPTrainingObjective` / `CNNTrainingObjective` remain as fully
  synthetic fallbacks (seeded two-moons / quadrant images) for
  environments without sklearn.

Protocol matches the reference objectives: ``get_data(x, s)`` with x the
hyperparameters (log10 learning rate in [-4, -1], hidden width fraction
in [0, 1]) and s the 1-based fidelity (epoch budget = 10 * s).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from fidelityfusion_tpu.data.cost import LinearCost


def _make_dataset(key, n=512, noise=0.2):
    """Two-moons-style binary classification."""
    k1, k2, k3 = jax.random.split(key, 3)
    t = jax.random.uniform(k1, (n,)) * jnp.pi
    upper = jax.random.bernoulli(k2, 0.5, (n,))
    x0 = jnp.where(upper, jnp.cos(t), 1.0 - jnp.cos(t))
    x1 = jnp.where(upper, jnp.sin(t), 0.5 - jnp.sin(t))
    X = jnp.stack([x0, x1], axis=1)
    X = X + noise * jax.random.normal(k3, X.shape)
    y = upper.astype(jnp.int32)
    return X, y


class MLPTrainingObjective:
    """Hyperparameter-BO objective: validation accuracy of a 2-layer MLP
    after ``10*s`` epochs of full-batch Adam (`mln_mnist.py:47-90` analog)."""

    def __init__(self, total_fidelity_num: int = 2, seed: int = 0,
                 max_width: int = 64):
        self.total_fidelity_num = total_fidelity_num
        self.x_dim = 2
        self.search_range = [[-4.0, -1.0], [0.0, 1.0], [0, 1]]
        self.cost = LinearCost(rate=10.0)
        self.max_width = max_width
        key = jax.random.PRNGKey(seed)
        ktr, kva = jax.random.split(key)
        self.X_train, self.y_train = _make_dataset(ktr)
        self.X_val, self.y_val = _make_dataset(kva, n=256)

    def _train_one(self, log10_lr: float, width_frac: float, epochs: int,
                   seed: int = 0) -> float:
        import optax

        width = max(4, int(round(width_frac * self.max_width)))
        lr = 10.0 ** float(log10_lr)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        params = {
            "w1": jax.random.normal(k1, (2, width)) * 0.5,
            "b1": jnp.zeros((width,)),
            "w2": jax.random.normal(k2, (width, 2)) * 0.5,
            "b2": jnp.zeros((2,)),
        }

        def logits(p, X):
            h = jnp.tanh(X @ p["w1"] + p["b1"])
            return h @ p["w2"] + p["b2"]

        def loss_fn(p, X, y):
            lg = logits(p, X)
            return jnp.mean(
                -jax.nn.log_softmax(lg)[jnp.arange(len(y)), y]
            )

        opt = optax.adam(lr)

        @jax.jit
        def run(p, X, y, Xv, yv):
            def step(carry, _):
                p, s = carry
                g = jax.grad(loss_fn)(p, X, y)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), ()

            (p_f, _), _ = jax.lax.scan(step, (p, opt.init(p)), None,
                                       length=epochs)
            acc = jnp.mean(
                (jnp.argmax(logits(p_f, Xv), axis=1) == yv).astype(jnp.float32)
            )
            return acc

        return float(run(params, self.X_train, self.y_train,
                         self.X_val, self.y_val))

    def get_data(self, x: np.ndarray, s: int) -> np.ndarray:
        """x: (n, 2) raw hyperparameters; s: 1-based fidelity ->
        10*s training epochs.  Returns validation accuracy (n, 1)."""
        x = np.atleast_2d(np.asarray(x, float))
        out = np.array(
            [
                self._train_one(row[0], row[1], epochs=10 * int(s))
                for row in x
            ]
        )
        return out.reshape(-1, 1)

    def initiate_data(self, index: Dict[int, int], seed: int):
        rng = np.random.default_rng(seed)

        def sample(n):
            lr = rng.random((n, 1)) * 3 - 4  # log10 lr in [-4, -1]
            w = rng.random((n, 1))
            return np.concatenate([lr, w], axis=1)

        x_low = sample(index[1])
        x_high = np.concatenate([x_low[: index[2] - 2], sample(2)], axis=0)
        return (
            [x_low, x_high],
            [self.get_data(x_low, 1), self.get_data(x_high, 2)],
        )

    Initiate_data = initiate_data


def _make_image_dataset(key, n=256, size=8, n_classes=4):
    """Synthetic image classification: a bright blob in one of four
    quadrants (+noise); the class is the quadrant."""
    k1, k2, k3 = jax.random.split(key, 3)
    y = jax.random.randint(k1, (n,), 0, n_classes)
    cy = jnp.where(y // 2 == 0, size // 4, 3 * size // 4).astype(jnp.float32)
    cx = jnp.where(y % 2 == 0, size // 4, 3 * size // 4).astype(jnp.float32)
    jit_pos = jax.random.normal(k2, (n, 2)) * 0.5
    rows = jnp.arange(size, dtype=jnp.float32)
    d2 = (
        (rows[None, :, None] - (cy + jit_pos[:, 0])[:, None, None]) ** 2
        + (rows[None, None, :] - (cx + jit_pos[:, 1])[:, None, None]) ** 2
    )
    X = jnp.exp(-0.5 * d2 / 2.0) + 0.3 * jax.random.normal(k3, (n, size, size))
    return X[..., None], y  # NHWC


class CNNTrainingObjective:
    """Hyperparameter-BO objective: validation accuracy of a small CNN
    after ``10*s`` epochs (`cnn_cifar10.py:60-117` analog; this environment
    has no dataset downloads, so the images are a seeded synthetic
    quadrant-classification task).  x = (log10 lr, channel-width fraction);
    fidelity s is 1-based -> 10*s full-batch Adam epochs on the MXU-friendly
    conv path (`lax.conv_general_dilated` via flax-free explicit params)."""

    def __init__(self, total_fidelity_num: int = 2, seed: int = 0,
                 max_channels: int = 16, image_size: int = 8):
        self.total_fidelity_num = total_fidelity_num
        self.x_dim = 2
        self.search_range = [[-4.0, -1.0], [0.0, 1.0], [0, 1]]
        self.cost = LinearCost(rate=10.0)
        self.max_channels = max_channels
        self.image_size = image_size
        key = jax.random.PRNGKey(seed)
        ktr, kva = jax.random.split(key)
        self.X_train, self.y_train = _make_image_dataset(ktr, n=256, size=image_size)
        self.X_val, self.y_val = _make_image_dataset(kva, n=128, size=image_size)

    def _train_one(self, log10_lr: float, width_frac: float, epochs: int,
                   seed: int = 0) -> float:
        import optax

        ch = max(2, int(round(width_frac * self.max_channels)))
        lr = 10.0 ** float(log10_lr)
        size, n_classes = self.image_size, 4
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        feat = (size // 2) * (size // 2) * ch
        params = {
            "conv": jax.random.normal(k1, (3, 3, 1, ch)) * 0.3,
            "w": jax.random.normal(k2, (feat, n_classes)) * 0.1,
            "b": jnp.zeros((n_classes,)),
        }

        def logits(p, X):
            h = jax.lax.conv_general_dilated(
                X, p["conv"], window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jax.nn.relu(h)
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            return h.reshape(h.shape[0], -1) @ p["w"] + p["b"]

        def loss_fn(p, X, y):
            lg = logits(p, X)
            return jnp.mean(-jax.nn.log_softmax(lg)[jnp.arange(len(y)), y])

        opt = optax.adam(lr)

        @jax.jit
        def run(p, X, y, Xv, yv):
            def step(carry, _):
                p, s = carry
                g = jax.grad(loss_fn)(p, X, y)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), ()

            (p_f, _), _ = jax.lax.scan(step, (p, opt.init(p)), None,
                                       length=epochs)
            acc = jnp.mean(
                (jnp.argmax(logits(p_f, Xv), axis=1) == yv).astype(jnp.float32)
            )
            return acc

        return float(run(params, self.X_train, self.y_train,
                         self.X_val, self.y_val))

    def get_data(self, x: np.ndarray, s: int) -> np.ndarray:
        x = np.atleast_2d(np.asarray(x, float))
        out = np.array(
            [self._train_one(row[0], row[1], epochs=10 * int(s)) for row in x]
        )
        return out.reshape(-1, 1)

    def initiate_data(self, index: Dict[int, int], seed: int):
        rng = np.random.default_rng(seed)

        def sample(n):
            lr = rng.random((n, 1)) * 3 - 4
            w = rng.random((n, 1))
            return np.concatenate([lr, w], axis=1)

        x_low = sample(index[1])
        x_high = np.concatenate([x_low[: index[2] - 2], sample(2)], axis=0)
        return (
            [x_low, x_high],
            [self.get_data(x_low, 1), self.get_data(x_high, 2)],
        )

    Initiate_data = initiate_data


class DigitsMLPObjective:
    """Hyperparameter-BO objective on REAL data: validation accuracy of a
    2-layer MLP (dropout regularized) on scikit-learn's bundled
    handwritten-digits dataset after ``10*s`` epochs of full-batch Adam.

    Mirrors the reference MNIST MLP objective (`Data_simulation/
    Real_Application/mln_mnist.py:47-90`: MLP 256-128 with dropout,
    test-accuracy objective, fidelity = epochs) at the scale this offline
    image allows: digits is 1797 8x8 images / 10 classes, shipped inside
    the sklearn package — no downloads.  x = (dropout rate in [0, 0.8],
    log10 lr in [-4, -1]); s is the 1-based fidelity -> 10*s epochs.
    Dropout uses a fixed PRNG stream per epoch (deterministic objective,
    like the reference's seed_everything policy, `mln_mnist.py:18-20`).
    """

    def __init__(self, total_fidelity_num: int = 2, seed: int = 0,
                 width: int = 64, n_train: int = 1200):
        from sklearn.datasets import load_digits

        self.total_fidelity_num = total_fidelity_num
        self.x_dim = 2
        self.search_range = [[0.0, 0.8], [-4.0, -1.0], [0, 1]]
        self.cost = LinearCost(rate=10.0)
        self.width = width
        d = load_digits()
        rng = np.random.default_rng(seed)
        perm = rng.permutation(len(d.data))
        X = (d.data[perm] / 16.0).astype(np.float32)
        y = d.target[perm].astype(np.int32)
        self.X_train, self.y_train = X[:n_train], y[:n_train]
        self.X_val, self.y_val = X[n_train:], y[n_train:]

    def _train_one(self, dropout: float, log10_lr: float, epochs: int,
                   seed: int = 0) -> float:
        import optax

        lr = 10.0 ** float(log10_lr)
        dropout = float(np.clip(dropout, 0.0, 0.95))
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        w = self.width
        params = {
            "w1": jax.random.normal(k1, (64, w)) * (1.0 / 8.0),
            "b1": jnp.zeros((w,)),
            "w2": jax.random.normal(k2, (w, 10)) * (1.0 / np.sqrt(w)),
            "b2": jnp.zeros((10,)),
        }

        def logits(p, X, drop_key=None):
            h = jax.nn.relu(X @ p["w1"] + p["b1"])
            if drop_key is not None and dropout > 0:
                keep = jax.random.bernoulli(drop_key, 1.0 - dropout, h.shape)
                h = jnp.where(keep, h / (1.0 - dropout), 0.0)
            return h @ p["w2"] + p["b2"]

        def loss_fn(p, X, y, drop_key):
            lg = logits(p, X, drop_key)
            return jnp.mean(-jax.nn.log_softmax(lg)[jnp.arange(len(y)), y])

        opt = optax.adam(lr)

        @jax.jit
        def run(p, X, y, Xv, yv):
            def step(carry, k):
                p, s = carry
                g = jax.grad(loss_fn)(p, X, y, k)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), ()

            keys = jax.random.split(k3, epochs)
            (p_f, _), _ = jax.lax.scan(step, (p, opt.init(p)), keys)
            acc = jnp.mean(
                (jnp.argmax(logits(p_f, Xv), axis=1) == yv).astype(
                    jnp.float32)
            )
            return acc

        return float(run(params, self.X_train, self.y_train,
                         self.X_val, self.y_val))

    def get_data(self, x: np.ndarray, s: int) -> np.ndarray:
        """x: (n, 2) = (dropout, log10 lr); s: 1-based fidelity -> 10*s
        epochs.  Returns validation accuracy (n, 1)."""
        x = np.atleast_2d(np.asarray(x, float))
        out = np.array(
            [self._train_one(row[0], row[1], epochs=10 * int(s))
             for row in x]
        )
        return out.reshape(-1, 1)

    def initiate_data(self, index: Dict[int, int], seed: int):
        rng = np.random.default_rng(seed)

        def sample(n):
            dr = rng.random((n, 1)) * 0.8
            lr = rng.random((n, 1)) * 3 - 4
            return np.concatenate([dr, lr], axis=1)

        x_low = sample(index[1])
        x_high = np.concatenate([x_low[: index[2] - 2], sample(2)], axis=0)
        return (
            [x_low, x_high],
            [self.get_data(x_low, 1), self.get_data(x_high, 2)],
        )

    Initiate_data = initiate_data


class DigitsCNNObjective(DigitsMLPObjective):
    """Hyperparameter-BO objective on REAL data: validation accuracy of a
    small CONV net on sklearn's bundled handwritten-digits images after
    ``10*s`` epochs.

    Mirrors the reference CIFAR-100 CNN objective (`Data_simulation/
    Real_Application/cnn_cifar10.py:40-117`: conv blocks -> dropout ->
    dense head, RMSprop, test-accuracy objective, fidelity = epochs,
    hyperparams (learning_rate, dropout_rate)) at the scale this offline
    image allows: digits 1797 8x8 images / 10 classes, no downloads.
    Architecture: two 3x3 conv blocks (8 -> 16 channels, ReLU, 2x2 mean
    pool after the first) -> dropout -> dense 10 — the `BuildingBlock`
    stack shape scaled to 8x8 inputs.  x = (dropout in [0, 0.8],
    log10 lr in [-4, -1]); deterministic (fixed PRNG stream per epoch).
    """

    def _train_one(self, dropout: float, log10_lr: float, epochs: int,
                   seed: int = 0) -> float:
        import optax

        lr = 10.0 ** float(log10_lr)
        dropout = float(np.clip(dropout, 0.0, 0.95))
        key = jax.random.PRNGKey(seed + 7)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        c1, c2 = 8, 16
        params = {
            "k1": jax.random.normal(k1, (3, 3, 1, c1)) * 0.3,
            "b1": jnp.zeros((c1,)),
            "k2": jax.random.normal(k2, (3, 3, c1, c2)) * 0.15,
            "b2": jnp.zeros((c2,)),
            "w": jax.random.normal(k3, (4 * 4 * c2, 10))
            * (1.0 / np.sqrt(4 * 4 * c2)),
            "b": jnp.zeros((10,)),
        }

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def logits(p, X, drop_key=None):
            h = X.reshape(-1, 8, 8, 1)
            h = jax.nn.relu(conv(h, p["k1"]) + p["b1"])
            # 2x2 mean pool -> 4x4 spatial
            h = h.reshape(-1, 4, 2, 4, 2, c1).mean(axis=(2, 4))
            h = jax.nn.relu(conv(h, p["k2"]) + p["b2"])
            h = h.reshape(h.shape[0], -1)
            if drop_key is not None and dropout > 0:
                keep = jax.random.bernoulli(drop_key, 1.0 - dropout, h.shape)
                h = jnp.where(keep, h / (1.0 - dropout), 0.0)
            return h @ p["w"] + p["b"]

        def loss_fn(p, X, y, drop_key):
            lg = logits(p, X, drop_key)
            return jnp.mean(-jax.nn.log_softmax(lg)[jnp.arange(len(y)), y])

        # RMSprop matches the reference optimizer (`cnn_cifar10.py:101`)
        opt = optax.rmsprop(lr)

        @jax.jit
        def run(p, X, y, Xv, yv):
            def step(carry, k):
                p, s = carry
                g = jax.grad(loss_fn)(p, X, y, k)
                u, s = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s), ()

            keys = jax.random.split(k4, epochs)
            (p_f, _), _ = jax.lax.scan(step, (p, opt.init(p)), keys)
            acc = jnp.mean(
                (jnp.argmax(logits(p_f, Xv), axis=1) == yv).astype(
                    jnp.float32)
            )
            return acc

        return float(run(params, self.X_train, self.y_train,
                         self.X_val, self.y_val))

"""Independent float64 oracles for the remaining iterative methods: PADDLE,
LaplacianShot bound updates, BDCSPN rectification, and a torch-Adam oracle
for alpha-TIM (the only gradient-based method — optimizer dynamics must
match torch.optim.Adam). Written from the algorithm equations, not the
reference code."""

import numpy as np
import pytest

import jax.numpy as jnp

from transductive_clip_tpu.methods.few_shot.bdcspn import bdcspn_infer
from transductive_clip_tpu.methods.few_shot.laplacian_shot import (
    laplacian_shot_infer,
)
from transductive_clip_tpu.methods.few_shot.paddle import paddle_infer
from transductive_clip_tpu.methods.few_shot.tim import tim_infer

from conftest import make_simplex_tasks

EPS = 1e-15


def make_fs(rng, n_task=2, n_class=5, shots=2, n_query=12, conc=40.0):
    y_s = np.tile(np.repeat(np.arange(n_class), shots), (n_task, 1))

    def feats(labels):
        out = np.zeros((*labels.shape, n_class))
        for t in range(labels.shape[0]):
            for i, c in enumerate(labels[t]):
                a = np.ones(n_class)
                a[c] += conc
                out[t, i] = rng.dirichlet(a)
        return out

    x_s = feats(y_s)
    y_q = rng.integers(0, n_class, (n_task, n_query))
    x_q = feats(y_q)
    return x_s, y_s, x_q, y_q


def softmax(z, axis=-1):
    z = z - z.max(axis=axis, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=axis, keepdims=True)


def one_hot(y, k):
    return (y[..., None] == np.arange(k)).astype(np.float64)


def test_paddle_tracks_fp64_oracle(rng):
    x_s, y_s, x_q, y_q = make_fs(rng)
    n_task, n_query, K = x_q.shape
    lambd, n_iter = 7.0, 5

    # ---- oracle ----
    oh = one_hot(y_s, K)
    counts = oh.sum(1)[..., None]
    supp_sums = np.einsum("tsk,tsd->tkd", oh, x_s)
    w = supp_sums / counts
    u = x_q.copy()
    v = np.zeros((n_task, K))
    for _ in range(n_iter):
        d2 = ((x_q[:, :, None, :] - w[:, None, :, :]) ** 2).sum(-1)
        u = softmax(-0.5 * d2 + lambd * v[:, None, :] / n_query)
        v = np.log(u.mean(1) + EPS) + 1.0
        w = (np.einsum("tnk,tnd->tkd", u, x_q) + supp_sums) / (
            u.sum(1) + counts[..., 0]
        )[..., None]

    u_ours, _ = paddle_infer(
        jnp.asarray(x_s, jnp.float32), jnp.asarray(x_q, jnp.float32),
        jnp.asarray(y_s, jnp.int32), jnp.asarray(x_q, jnp.float32),
        jnp.float32(lambd), n_iter=n_iter, n_class=K,
    )
    u_ours = np.asarray(u_ours, np.float64)
    np.testing.assert_array_equal(u_ours.argmax(-1), u.argmax(-1))
    np.testing.assert_allclose(u_ours, u, atol=5e-3)


def test_laplacian_shot_tracks_fp64_oracle(rng):
    x_s, y_s, x_q, y_q = make_fs(rng, n_query=10)
    n_task, n_query, K = x_q.shape
    lmd, knn, n_iter = 0.7, 3, 8

    def l2(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    # ---- oracle (one task at a time) ----
    acc_oracle = np.zeros((n_task, n_iter))
    for t in range(n_task):
        s, q = l2(x_s[t]), l2(x_q[t])
        oh = one_hot(y_s[t], K)
        protos = (oh.T @ s) / oh.sum(0)[:, None]
        unary = ((q[:, None, :] - protos[None, :, :]) ** 2).sum(-1)
        d = ((q[:, None, :] - q[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        W = np.zeros((n_query, n_query))
        for i in range(n_query):
            W[i, np.argsort(d[i])[: knn - 1]] = 1.0
        Y = softmax(-unary)
        oldE, done = np.inf, False
        for i in range(n_iter):
            if not done:
                Y = softmax(-unary + lmd * (W @ Y))
                pair = W @ Y
                E = (Y * np.log(np.maximum(Y, 1e-20))
                     + unary * Y - lmd * pair * Y).sum()
                done = i > 1 and abs(E - oldE) <= 1e-6 * abs(oldE)
                oldE = E
            acc_oracle[t, i] = (Y.argmax(-1) == y_q[t]).mean()

    acc_ours, _ = laplacian_shot_infer(
        jnp.asarray(x_s, jnp.float32), jnp.asarray(x_q, jnp.float32),
        jnp.asarray(y_s, jnp.int32), jnp.asarray(y_q, jnp.int32),
        jnp.float32(lmd), n_iter=n_iter, knn=knn, n_class=K,
    )
    np.testing.assert_allclose(np.asarray(acc_ours), acc_oracle, atol=1e-6)


def test_bdcspn_tracks_fp64_oracle(rng):
    x_s, y_s, x_q, y_q = make_fs(rng)
    n_task, n_query, K = x_q.shape
    temp = 20.0

    def l2(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    u_oracle = np.zeros((n_task, n_query, K))
    for t in range(n_task):
        s, q = l2(x_s[t]), l2(x_q[t])
        oh = one_hot(y_s[t], K)
        protos = (oh.T @ s) / oh.sum(0)[:, None]
        eta = s.mean(0) - q.mean(0)
        aug = np.concatenate([s, q + eta], axis=0)

        def cos_logits(w, x):
            wn, xn = l2(w), l2(x)
            return -0.5 * ((xn[:, None, :] - wn[None, :, :]) ** 2).sum(-1)

        u = softmax(temp * cos_logits(protos, aug))
        aug_n = l2(aug)
        protos2 = (u.T @ aug_n) / u.sum(0)[:, None]
        u_oracle[t] = softmax(temp * cos_logits(protos2, q))

    u_ours = np.asarray(
        bdcspn_infer(
            jnp.asarray(x_s, jnp.float32), jnp.asarray(x_q, jnp.float32),
            jnp.asarray(y_s, jnp.int32), jnp.float32(temp), n_class=K,
        ),
        np.float64,
    )
    np.testing.assert_array_equal(u_ours.argmax(-1), u_oracle.argmax(-1))
    np.testing.assert_allclose(u_ours, u_oracle, atol=5e-3)


def test_alpha_tim_matches_torch_adam_oracle(rng):
    """optax.adam must reproduce torch.optim.Adam dynamics on the TIM loss."""
    torch = pytest.importorskip("torch")
    x_s, y_s, x_q, y_q = make_fs(rng, n_task=2, n_class=4, n_query=10)
    n_task, n_query, K = x_q.shape
    temp, lr, alpha_value, n_iter = 15.0, 1e-3, 3.0, 40
    loss_weights = [1.0, 1.0, 1.0]

    # ---- torch oracle (fp64) ----
    ts = torch.tensor(x_s)
    tq = torch.tensor(x_q)
    oh = torch.tensor(one_hot(y_s, K))
    counts = oh.sum(1).unsqueeze(-1)
    weights = (oh.transpose(1, 2) @ ts) / counts
    weights.requires_grad_()
    opt = torch.optim.Adam([weights], lr=lr)
    eps = 1e-12

    def logits(w, x):
        return temp * (
            x @ w.transpose(1, 2)
            - 0.5 * (w ** 2).sum(-1).unsqueeze(1)
            - 0.5 * (x ** 2).sum(-1).unsqueeze(2)
        )

    for _ in range(n_iter):
        logits_s = logits(weights, ts)
        logits_q = logits(weights, tq)
        probs_s = logits_s.softmax(-1)
        q_probs = logits_q.softmax(-1)
        ce = -(oh * torch.log(probs_s + eps)).sum(2).mean(1).sum(0)
        marg = q_probs.mean(1)
        q_ent = ((1 - marg.pow(alpha_value).sum(1)) / (alpha_value - 1)).sum(0)
        q_cond = ((1 - (q_probs + eps).pow(alpha_value).sum(2))
                  / (alpha_value - 1)).mean(1).sum(0)
        loss = loss_weights[0] * ce - (loss_weights[1] * q_ent
                                       - loss_weights[2] * q_cond)
        opt.zero_grad()
        loss.backward()
        opt.step()
    u_oracle = logits(weights, tq).softmax(-1).detach().numpy()

    # ---- ours ----
    u_ours, _ = tim_infer(
        jnp.asarray(x_s, jnp.float32), jnp.asarray(x_q, jnp.float32),
        jnp.asarray(y_s, jnp.int32), jnp.float32(temp),
        jnp.float32(alpha_value), jnp.asarray(loss_weights, jnp.float32),
        n_iter=n_iter, n_class=K, entropies=("Shannon", "Alpha", "Alpha"),
        lr=lr,
    )
    u_ours = np.asarray(u_ours, np.float64)
    np.testing.assert_array_equal(u_ours.argmax(-1), u_oracle.argmax(-1))
    np.testing.assert_allclose(u_ours, u_oracle, atol=5e-3)

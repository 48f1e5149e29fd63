"""Sharded contrastive training step (encoder adaptation).

The framework's trainable surface: a projection head ``W [d_in, d_out]`` on
top of the feature sketch, tuned with an in-batch InfoNCE objective on
(query, positive-article) pairs — the standard recipe for adapting a
retrieval encoder to a corpus. The step is sharded DP×TP on the
(data, model) mesh:

- batch rows shard over ``data`` (DP); gradients all-reduce with ``psum``;
- ``W`` columns shard over ``model`` (TP); the similarity logits contract
  over the sharded output dimension, so partial products reduce with
  ``psum`` over ICI;
- in-batch negatives come from the *global* batch: projected docs are
  all-gathered across ``data`` so every query scores against every doc.

One jitted program; this is the ``dryrun_multichip`` training step.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from legalrag_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def make_contrastive_train_step(mesh: Mesh, lr: float = 1e-2,
                                temperature: float = 0.05,
                                l2sp: float = 0.0):
    """(W [d_in, d_out] sharded P(None, model), q [B, d_in] P(data, None),
    d [B, d_in] P(data, None)) → (W', loss).

    ``l2sp``: L2-SP regularization toward the initial projection (the
    anti-overfitting control for small corpora — the head has ~10⁷ params
    while a statute corpus yields ~10³ pairs). When set, pass the same
    sharded ``w0`` alongside ``w``: step(w, w0, q, d)."""

    def local(w_local, *args):
        if l2sp > 0:
            w0_local, q_local, d_local = args
        else:
            (q_local, d_local), w0_local = args, None
        dp = jax.lax.psum(1, DATA_AXIS)
        b_local = q_local.shape[0]

        def loss_fn(w):
            zq = jnp.dot(q_local, w, preferred_element_type=jnp.float32)
            zd = jnp.dot(d_local, w, preferred_element_type=jnp.float32)

            def l2_normalize(z):
                # norm² contracts over the TP-sharded dim → psum over model
                n2 = jax.lax.psum(jnp.sum(z * z, axis=-1, keepdims=True),
                                  MODEL_AXIS)
                return z * jax.lax.rsqrt(jnp.maximum(n2, 1e-12))

            zq = l2_normalize(zq)
            zd = l2_normalize(zd)
            # global in-batch negatives: gather docs across DP ranks
            zd_all = jax.lax.all_gather(zd, DATA_AXIS, axis=0, tiled=True)
            # cosine logits contract over the TP-sharded dim → psum
            logits = jax.lax.psum(
                jnp.dot(zq, zd_all.T, preferred_element_type=jnp.float32),
                MODEL_AXIS) / temperature
            my_rank = jax.lax.axis_index(DATA_AXIS)
            labels = my_rank * b_local + jnp.arange(b_local)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
            if l2sp > 0:
                nll = nll + l2sp * jnp.mean((w - w0_local) ** 2) * w.size / 1e4
            return nll

        loss, grad = jax.value_and_grad(loss_fn)(w_local)
        # DP all-reduce: average gradients across data ranks
        grad = jax.lax.pmean(grad, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        return w_local - lr * grad, loss

    if l2sp > 0:
        in_specs = (P(None, MODEL_AXIS), P(None, MODEL_AXIS),
                    P(DATA_AXIS, None), P(DATA_AXIS, None))
    else:
        in_specs = (P(None, MODEL_AXIS), P(DATA_AXIS, None),
                    P(DATA_AXIS, None))
    fn = shard_map(
        local, mesh=mesh, in_specs=in_specs,
        out_specs=(P(None, MODEL_AXIS), P()),
        check_vma=False)
    return jax.jit(fn)


def init_projection(mesh: Mesh, d_in: int, d_out: int, seed: int = 0):
    w = jax.random.normal(jax.random.PRNGKey(seed), (d_in, d_out),
                          jnp.float32) / jnp.sqrt(d_out)
    return jax.device_put(w, NamedSharding(mesh, P(None, MODEL_AXIS)))

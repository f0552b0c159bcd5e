import jax
import jax.numpy as jnp
import numpy as np

from bdvcil_tpu.models.linears import (
    CosineLinear,
    SimpleLinear,
    SplitCosineLinear,
    nca_loss,
    reduce_proxies,
)


def test_simple_linear():
    m = SimpleLinear(out_features=4)
    x = jnp.ones((2, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 4)


def test_cosine_linear_bounded_and_sigma():
    m = CosineLinear(out_features=4, sigma=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(v, x))
    assert (np.abs(out) <= 1 + 1e-5).all()

    m2 = CosineLinear(out_features=4, sigma=True)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert "sigma" in v2["params"]


def test_split_cosine_linear_concat():
    m = SplitCosineLinear(out_features1=3, out_features2=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (5, 5)


def test_reduce_proxies():
    sims = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])  # 2 classes x 2 proxies
    out = np.asarray(reduce_proxies(sims, 2))
    np.testing.assert_allclose(out, [[1.0, 0.0]], atol=1e-6)
    # identity for 1 proxy
    np.testing.assert_allclose(np.asarray(reduce_proxies(sims, 1)), np.asarray(sims))


def test_nca_loss_runs():
    sims = jnp.asarray([[0.9, -0.1, 0.0], [0.1, 0.8, -0.2]])
    t = jnp.asarray([0, 1])
    loss = float(nca_loss(sims, t))
    assert loss >= 0.0 and np.isfinite(loss)

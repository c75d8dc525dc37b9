import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.models import CalibrationNetwork
from davo_tpu.solve import BFGSConfig

M, N = 3, 5
SOLVER = BFGSConfig(
    error_threshold=1e-7,
    training_error_threshold=1e-3,
    iterations=8,
    training_iterations=3,
    drop_path_p=0.1,
    line_search_iterations=20,
)


@pytest.fixture()
def network():
    return CalibrationNetwork(
        num_views=M, num_points=N, hidden_size=32, solver=SOLVER
    )


@pytest.fixture()
def batch(key):
    return generate_batch(key, 4, SceneConfig(num_views=M, num_points=N))


def _init(network, batch, key):
    return network.init(
        {"params": key},
        batch.projected_points,
        batch.visibility_mask,
        training=False,
    )


@pytest.mark.slow
def test_transformer_head_forward_and_grads(batch, key):
    import jax.numpy as jnp

    net = CalibrationNetwork(
        num_views=M,
        num_points=N,
        hidden_size=32,
        solver=SOLVER,
        head="transformer",
        transformer_layers=1,
        transformer_heads=2,
    )
    variables = net.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    out, err = net.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        return_error=True,
    )
    assert out.shape == (4, 3 + 3 * N + 6 * (M - 1))
    assert np.all(np.isfinite(out)) and np.all(np.isfinite(err))

    def loss(params):
        result, e = net.apply(
            {"params": params},
            batch.projected_points,
            batch.visibility_mask,
            training=True,
            return_error=True,
            rngs={"drop_path": key},
            mutable=["batch_stats"],
        )[0]
        return jnp.mean(e) + jnp.mean(jnp.square(result))

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert any(np.any(np.asarray(g) != 0.0) for g in leaves)


def test_unknown_head_raises(batch, key):
    net = CalibrationNetwork(
        num_views=M, num_points=N, hidden_size=8, head="nope"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        net.init({"params": key}, batch.projected_points, batch.visibility_mask)


def test_forward_shapes(network, batch, key):
    variables = _init(network, batch, key)
    out = network.apply(
        variables, batch.projected_points, batch.visibility_mask, training=False
    )
    assert out.shape == (4, 3 + 3 * N + 6 * (M - 1))
    assert np.all(np.isfinite(out))


def test_return_error(network, batch, key):
    variables = _init(network, batch, key)
    out, err = network.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        training=False,
        return_error=True,
    )
    assert err.shape == (4,)
    assert np.all(np.asarray(err) >= 0.0)


def test_solver_reduces_error_vs_raw_guess(network, batch, key):
    # The BFGS refinement must not make the guess worse.
    from davo_tpu.camera import calibration_error

    variables = _init(network, batch, key)
    out, err = network.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        training=False,
        return_error=True,
    )
    # recompute the raw guess error by running the MLP head only
    guess_net = CalibrationNetwork(
        num_views=M,
        num_points=N,
        hidden_size=32,
        solver=BFGSConfig(iterations=0, drop_path_p=0.0),
    )
    raw, raw_err = guess_net.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        training=False,
        return_error=True,
    )
    assert np.all(np.asarray(err) <= np.asarray(raw_err) + 1e-6)


def test_training_mode_runs_with_batchnorm_and_droppath(network, batch, key):
    variables = _init(network, batch, key)
    out, mutated = network.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        training=True,
        rngs={"drop_path": jax.random.fold_in(key, 7)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_gradients_flow_to_mlp_weights(network, batch, key):
    variables = _init(network, batch, key)

    def loss_fn(params):
        out, err = network.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch.projected_points,
            batch.visibility_mask,
            training=True,
            return_error=True,
            rngs={"drop_path": jax.random.fold_in(key, 3)},
            mutable=["batch_stats"],
        )[0]
        return jnp.mean(err) + jnp.mean(jnp.square(out))

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert any(np.any(np.asarray(g) != 0.0) for g in leaves)


def test_lbfgs_solver_option(batch, key):
    """The network accepts an LBFGSConfig and the solve still reduces the
    reprojection error vs the raw guess (same contract as BFGS)."""
    from davo_tpu.solve import LBFGSConfig

    net = CalibrationNetwork(
        num_views=M,
        num_points=N,
        hidden_size=32,
        solver=LBFGSConfig(
            history=5,
            error_threshold=1e-7,
            iterations=8,
            drop_path_p=0.0,
            line_search_iterations=20,
        ),
    )
    variables = _init(net, batch, key)
    out, err = net.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        training=False,
        return_error=True,
    )
    assert out.shape == (4, net_num_params())
    assert np.all(np.isfinite(np.asarray(err)))

    guess_only = CalibrationNetwork(
        num_views=M,
        num_points=N,
        hidden_size=32,
        solver=LBFGSConfig(iterations=0, drop_path_p=0.0),
    )
    _, raw_err = guess_only.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        training=False,
        return_error=True,
    )
    assert float(jnp.mean(err)) <= float(jnp.mean(raw_err)) + 1e-9


def net_num_params():
    from davo_tpu.camera import num_calibration_parameters

    return num_calibration_parameters(M, N)


@pytest.mark.parametrize(
    "restarts", [1, pytest.param(3, marks=pytest.mark.slow)]
)
def test_fused_objective_matches_plain(batch, key, restarts):
    # The fused-objective eval path (here: its jnp fallback, since tests run
    # on CPU) must produce the same solves as the plain objective.
    common = dict(
        num_views=M, num_points=N, hidden_size=32, solver=SOLVER,
        num_restarts=restarts,
    )
    plain = CalibrationNetwork(**common, fused_objective=False)
    fused = CalibrationNetwork(**common, fused_objective=True)
    variables = _init(plain, batch, key)
    kwargs = dict(training=False, return_error=True)
    out_p, err_p = plain.apply(
        variables, batch.projected_points, batch.visibility_mask, **kwargs
    )
    out_f, err_f = fused.apply(
        variables, batch.projected_points, batch.visibility_mask, **kwargs
    )
    # The network runs f32 (flax-init params); the fused path evaluates the
    # channel-major formulation whose float ordering differs from
    # calibration_error's, so iterates drift at roundoff scale over the
    # solve.  A wiring bug (tiling/ordering/selection) would show as O(1).
    np.testing.assert_allclose(out_f, out_p, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(err_f, err_p, rtol=2e-3, atol=2e-4)

import jax
import numpy as np
import pytest

from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.models import CalibrationNetwork
from davo_tpu.solve import BFGSConfig

M, N = 3, 5
SOLVER = BFGSConfig(
    error_threshold=1e-7,
    iterations=6,
    drop_path_p=0.0,
    line_search_iterations=10,
)


@pytest.mark.slow
def test_multi_start_never_worse_than_single(key):
    batch = generate_batch(key, 4, SceneConfig(num_views=M, num_points=N))
    single = CalibrationNetwork(
        num_views=M, num_points=N, hidden_size=16, solver=SOLVER, num_restarts=1
    )
    multi = CalibrationNetwork(
        num_views=M, num_points=N, hidden_size=16, solver=SOLVER, num_restarts=4
    )
    variables = single.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    _, err_single = single.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        return_error=True,
    )
    _, err_multi = multi.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        return_error=True,
    )
    # estimate 0 of the multi-start IS the single start: best-of can only
    # be <= up to solver stochasticity (there is none: same deterministic
    # solve)
    assert np.all(np.asarray(err_multi) <= np.asarray(err_single) + 1e-9)


@pytest.mark.slow
def test_multi_start_training_mode_uses_single_path(key):
    batch = generate_batch(key, 2, SceneConfig(num_views=M, num_points=N))
    multi = CalibrationNetwork(
        num_views=M,
        num_points=N,
        hidden_size=16,
        solver=BFGSConfig(
            error_threshold=1e-7,
            training_error_threshold=1e-3,
            iterations=4,
            training_iterations=2,
            drop_path_p=0.1,
            line_search_iterations=8,
        ),
        num_restarts=4,
    )
    variables = multi.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    out, _ = multi.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        training=True,
        return_error=True,
        rngs={"drop_path": key},
        mutable=["batch_stats"],
    )
    result, err = out
    assert result.shape[0] == 2
    assert np.all(np.isfinite(err))


class TestPermutationProposals:
    def test_unpermutation_round_trip(self):
        """With a head that predicts world points straight from the pixel
        values, the un-permutation must return every start's points in the
        ORIGINAL point order (identical across restarts for this head)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from davo_tpu.models import permutation_restart_guesses

        b, m, n = 2, 2, 5
        rng = np.random.default_rng(0)
        pixels = jnp.asarray(rng.normal(size=(b, m, n, 2)))
        vis = jnp.ones((b, m, n))

        def head(px, vv):
            # "predicts" point i's (x, y, z) from view 0's pixel i —
            # point-order-equivariant by construction
            pts = jnp.concatenate(
                [px[:, 0], jnp.sum(px, axis=(1, 3), keepdims=False)[..., None] * 0 + 1.0],
                axis=-1,
            )  # (B, N, 3)
            intr = jnp.zeros((px.shape[0], 3))
            poses = jnp.zeros((px.shape[0], 6 * (m - 1)))
            return jnp.concatenate(
                [intr, pts.reshape(px.shape[0], -1), poses], axis=-1
            )

        raw = head(pixels, vis)
        starts = permutation_restart_guesses(
            head, pixels, vis, raw, n, jax.random.key(0), restarts=4
        )
        assert starts.shape == (b, 4, raw.shape[-1])
        for e in range(4):
            np.testing.assert_allclose(
                np.asarray(starts[:, e]), np.asarray(raw), atol=1e-12
            )

    def test_network_permutation_proposals_run(self, key):
        import jax.numpy as jnp
        import numpy as np

        from davo_tpu.data import SceneConfig, generate_batch
        from davo_tpu.models import CalibrationNetwork
        from davo_tpu.solve import BFGSConfig

        m, n = 3, 5
        batch = generate_batch(key, 4, SceneConfig(num_views=m, num_points=n))
        net = CalibrationNetwork(
            num_views=m,
            num_points=n,
            hidden_size=32,
            head="transformer",
            transformer_layers=1,
            transformer_heads=2,
            num_restarts=3,
            restart_proposals="permutation",
            solver=BFGSConfig(
                error_threshold=1e-7,
                iterations=4,
                drop_path_p=0.0,
                line_search_iterations=8,
            ),
        )
        variables = net.init(
            {"params": key},
            batch.projected_points,
            batch.visibility_mask,
            training=False,
        )
        out, err = net.apply(
            variables,
            batch.projected_points,
            batch.visibility_mask,
            training=False,
            return_error=True,
        )
        assert out.shape == (4, 3 + 3 * n + 6 * (m - 1))
        assert np.all(np.isfinite(np.asarray(err)))

    def test_network_input_noise_proposals_run(self, key):
        import numpy as np

        from davo_tpu.data import SceneConfig, generate_batch
        from davo_tpu.models import CalibrationNetwork
        from davo_tpu.solve import BFGSConfig

        m, n = 3, 5
        batch = generate_batch(key, 4, SceneConfig(num_views=m, num_points=n))
        net = CalibrationNetwork(
            num_views=m,
            num_points=n,
            hidden_size=32,
            head="mlp",
            num_restarts=3,
            restart_proposals="input_noise",
            input_noise=0.02,
            solver=BFGSConfig(
                error_threshold=1e-7,
                iterations=4,
                drop_path_p=0.0,
                line_search_iterations=8,
            ),
        )
        variables = net.init(
            {"params": key},
            batch.projected_points,
            batch.visibility_mask,
            training=False,
        )
        out, err = net.apply(
            variables,
            batch.projected_points,
            batch.visibility_mask,
            training=False,
            return_error=True,
        )
        assert out.shape == (4, 3 + 3 * n + 6 * (m - 1))
        assert np.all(np.isfinite(np.asarray(err)))

    def test_unknown_proposals_raise(self, key):
        import pytest as _pytest

        from davo_tpu.data import SceneConfig, generate_batch
        from davo_tpu.models import CalibrationNetwork

        m, n = 2, 4
        batch = generate_batch(key, 2, SceneConfig(num_views=m, num_points=n))
        net = CalibrationNetwork(
            num_views=m,
            num_points=n,
            hidden_size=16,
            num_restarts=2,
            restart_proposals="bogus",
        )
        with _pytest.raises(ValueError):
            net.init(
                {"params": key},
                batch.projected_points,
                batch.visibility_mask,
                training=False,
            )

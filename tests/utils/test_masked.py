import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.utils import masked_merge_tensors, masked_update


def test_masked_update_broadcasts_trailing_dims():
    cur = jnp.zeros((4, 3))
    new = jnp.ones((4, 3))
    mask = jnp.asarray([True, False, True, False])
    out = masked_update(cur, new, mask)
    np.testing.assert_array_equal(np.asarray(out)[:, 0], [1.0, 0.0, 1.0, 0.0])


class TestMaskedMergeTensors:
    update_mask = jnp.asarray([True, False, True, False])
    v1 = jnp.asarray([1.0, 1.0, 1.0, 1.0])
    v2 = jnp.asarray([2.0, 2.0, 2.0, 2.0])
    m1 = jnp.asarray([True, True, False, False])
    m2 = jnp.asarray([True, False, True, False])

    def test_both_none(self):
        assert masked_merge_tensors(None, None, None, None, self.update_mask) == (
            None,
            None,
        )

    def test_both_values_no_masks(self):
        values, mask = masked_merge_tensors(
            self.v1, None, self.v2, None, self.update_mask
        )
        np.testing.assert_array_equal(values, [2.0, 1.0, 2.0, 1.0])
        assert mask is None

    def test_both_values_both_masks(self):
        values, mask = masked_merge_tensors(
            self.v1, self.m1, self.v2, self.m2, self.update_mask
        )
        np.testing.assert_array_equal(values, [2.0, 1.0, 2.0, 1.0])
        np.testing.assert_array_equal(mask, [True, True, True, False])

    def test_both_values_mask_1_only(self):
        values, mask = masked_merge_tensors(
            self.v1, self.m1, self.v2, None, self.update_mask
        )
        np.testing.assert_array_equal(values, [2.0, 1.0, 2.0, 1.0])
        # entries taken from 2 (update true) are always valid
        np.testing.assert_array_equal(mask, [True, True, True, False])

    def test_both_values_mask_2_only(self):
        values, mask = masked_merge_tensors(
            self.v1, None, self.v2, self.m2, self.update_mask
        )
        np.testing.assert_array_equal(values, [2.0, 1.0, 2.0, 1.0])
        # entries taken from 1 (update false) are always valid
        np.testing.assert_array_equal(mask, [True, True, True, True])

    def test_only_values_1(self):
        values, mask = masked_merge_tensors(
            self.v1, None, None, None, self.update_mask
        )
        np.testing.assert_array_equal(values, self.v1)
        np.testing.assert_array_equal(mask, [False, True, False, True])

    def test_only_values_1_with_mask(self):
        values, mask = masked_merge_tensors(
            self.v1, self.m1, None, None, self.update_mask
        )
        np.testing.assert_array_equal(values, self.v1)
        np.testing.assert_array_equal(mask, [False, True, False, False])

    def test_only_values_2(self):
        values, mask = masked_merge_tensors(
            None, None, self.v2, None, self.update_mask
        )
        np.testing.assert_array_equal(values, self.v2)
        np.testing.assert_array_equal(mask, self.update_mask)

    def test_only_values_2_with_mask(self):
        values, mask = masked_merge_tensors(
            None, None, self.v2, self.m2, self.update_mask
        )
        np.testing.assert_array_equal(values, self.v2)
        np.testing.assert_array_equal(mask, [True, False, True, False])

    def test_multidim_values_scalar_batch_mask(self):
        v1 = jnp.zeros((4, 2, 3))
        v2 = jnp.ones((4, 2, 3))
        values, mask = masked_merge_tensors(v1, None, v2, None, self.update_mask)
        assert mask is None
        np.testing.assert_array_equal(
            np.asarray(values)[:, 0, 0], [1.0, 0.0, 1.0, 0.0]
        )

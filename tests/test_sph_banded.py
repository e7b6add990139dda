"""Banded column sweep (r5, sph_pallas._column_body_banded): exact
contiguous window row ranges per home chunk replace the cond-scanned
z-band skip (a skipped lax.cond still costs ~100 ns on this chip; the
2M step issued ~5M of them).  Must be BITWISE identical to the
whole-tile column kernel — skipped tiles would have contributed exact
zeros through the |czi-czj| <= 1 pair gate.  CPU interpret mode;
real-TPU bitwise check + timing in verify (r5 banded A/B rows)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpufluids import binning
from tpufluids.config import BASE_CONFIG
from tpufluids.scenes import random_blob
from tpufluids.sph_pallas import base_forces_pallas


@pytest.mark.parametrize("w_chunk,h_chunk", [(64, 64), (32, 64)])
def test_banded_matches_whole_tile_bitwise(w_chunk, h_chunk):
    cfg = BASE_CONFIG.replace(max_per_cell=32, pallas_col_cap=128)
    state = random_blob(300, seed=2, span=0.8)
    order, bt = binning.sort_tables(state, cfg)
    with pltpu.force_tpu_interpret_mode():
        sw0, dp0, ov0 = base_forces_pallas(
            state, bt, cfg, b=128, w_cap=128, order=order,
            w_chunk=64, h_chunk=0)
        sw1, dp1, ov1 = base_forces_pallas(
            state, bt, cfg, b=128, w_cap=128, order=order,
            w_chunk=w_chunk, h_chunk=h_chunk)
    np.testing.assert_array_equal(np.asarray(sw1), np.asarray(sw0))
    np.testing.assert_array_equal(np.asarray(dp1), np.asarray(dp0))
    assert int(ov1) == int(ov0) == 0

"""Real-asset path: FLAME-2019 expr-vertex derivation + gated full-asset load.

The derivation logic (reference avatar/common/utils/smpl_x.py:115-137) is
differential-tested against a hand-built FLAME-2019-shaped pickle; loading
the real SMPL-X 1.1 / FLAME files (V=10475 -> V_hr≈167k) runs only when
EXAVATAR_HUMAN_MODEL_PATH points at a reference-layout human_model_files
directory (not shipped in CI images for licensing reasons).
"""
import os
import os.path as osp
import pickle

import numpy as np
import pytest

from exavatar_release_tpu.models.smplx.prior import (
    REAL_LIP_VERTEX_IDX,
    build_prior,
    derive_expr_vertex_idx_flame2019,
    load_prior_tables,
)

ASSET_PATH = os.environ.get("EXAVATAR_HUMAN_MODEL_PATH", "")


class TestFlame2019Derivation:
    def test_support_minus_neck_eyes_mapped(self, tmp_path):
        """Vertices with any nonzero expr blendshape (shapedirs cols
        300:350) survive unless their dominant LBS joint is Neck/L_Eye/R_Eye,
        and come back as SMPL-X ids via the correspondence table."""
        Vf = 20
        rng = np.random.default_rng(0)
        shapedirs = np.zeros((Vf, 3, 360), np.float64)
        # expr support on verts 3..12 (col 310) and vert 15 (col 349)
        shapedirs[3:13, 1, 310] = 1e-3
        shapedirs[15, 0, 349] = 2.0
        # shape-only support (cols < 300) must NOT count
        shapedirs[0, 0, 5] = 1.0
        weights = np.zeros((Vf, 5), np.float64)
        weights[:, 1] = 1.0  # default dominant: Head
        weights[4] = [1, 0, 0, 0, 0]  # Neck-dominated -> excluded
        weights[5] = [0, 0, 0, 1, 0]  # L_Eye -> excluded
        weights[15] = [0, 0, 0, 0, 1]  # R_Eye -> excluded
        weights[6] = [0, 0, 1, 0, 0]  # Jaw -> kept
        pkl = tmp_path / "generic_model.pkl"
        with open(pkl, "wb") as f:
            pickle.dump(
                {"shapedirs": shapedirs, "weights": weights,
                 "v_template": np.zeros((Vf, 3))}, f,
            )
        face_vertex_idx = (np.arange(Vf) * 7 + 100).astype(np.int32)

        out = derive_expr_vertex_idx_flame2019(str(pkl), face_vertex_idx)
        expected_flame = [3, 6, 7, 8, 9, 10, 11, 12]  # 4,5 excluded; 15 excluded
        np.testing.assert_array_equal(out, face_vertex_idx[expected_flame])

    def test_expr_param_dim_window(self, tmp_path):
        """Support strictly outside 300:300+expr_param_dim is ignored."""
        Vf = 8
        shapedirs = np.zeros((Vf, 3, 400), np.float64)
        shapedirs[2, 0, 310] = 1.0  # inside the 50-dim window
        shapedirs[3, 0, 370] = 1.0  # outside -> ignored
        weights = np.zeros((Vf, 5), np.float64)
        weights[:, 1] = 1.0
        pkl = tmp_path / "generic_model.pkl"
        with open(pkl, "wb") as f:
            pickle.dump({"shapedirs": shapedirs, "weights": weights,
                         "v_template": np.zeros((Vf, 3))}, f)
        fvi = np.arange(Vf, dtype=np.int32)
        out = derive_expr_vertex_idx_flame2019(str(pkl), fvi, expr_param_dim=50)
        np.testing.assert_array_equal(out, [2])


@pytest.mark.skipif(
    not (ASSET_PATH and osp.exists(osp.join(ASSET_PATH, "smplx"))),
    reason="EXAVATAR_HUMAN_MODEL_PATH not set / assets absent",
)
class TestRealAssets:
    """Runs only with the released SMPL-X 1.1 + FLAME assets on disk
    (reference avatar/common/utils/smpl_x.py:15-54 numerology)."""

    def test_full_prior_numerology(self):
        from exavatar_release_tpu.models.smplx.assets_io import load_smplx_assets

        assets = load_smplx_assets(ASSET_PATH, "male")
        assert assets.num_vertices == 10475
        tables = load_prior_tables(ASSET_PATH)
        assert tables["face_vertex_idx"].shape[0] == 5023  # FLAME vertex count
        assert tables["lhand_vertex_idx"].shape[0] == 778  # MANO vertex count
        assert tables["rhand_vertex_idx"].shape[0] == 778
        assert "expr_vertex_idx" in tables and len(tables["expr_vertex_idx"]) > 0

        prior = build_prior(
            assets,
            lip_vertex_idx=REAL_LIP_VERTEX_IDX,
            face_vertex_idx=tables["face_vertex_idx"],
            lhand_vertex_idx=tables["lhand_vertex_idx"],
            rhand_vertex_idx=tables["rhand_vertex_idx"],
            expr_vertex_idx=tables["expr_vertex_idx"],
        )
        # 6 cavity faces appended before subdivision (smpl_x.py:102-113)
        assert prior.faces_with_cavity.shape[0] == assets.faces.shape[0] + 6
        # 2x midpoint subdivision: V_hr = V + E1 + E2 ~= 167k
        assert 160_000 < prior.vertex_num_upsampled < 175_000
        # part masks non-degenerate
        for m in (prior.is_rhand_hr, prior.is_lhand_hr, prior.is_face_hr,
                  prior.is_face_expr_hr, prior.is_cavity_hr):
            assert 0 < int(np.asarray(m).sum()) < prior.vertex_num_upsampled

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lrr_tpu.models import Affine3D
from lrr_tpu.models.affine import normal_equations_terms
from lrr_tpu.parallel import (
    distributed_normal_equations,
    make_mesh,
    shard_candidates,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


class TestMesh:
    def test_shape(self, mesh):
        assert mesh.devices.shape == (2, 4)
        assert mesh.axis_names == ("dp", "mp")

    def test_explicit_dp(self):
        m = make_mesh(8, dp=4)
        assert m.devices.shape == (4, 2)


class TestDistributedNormalEquations:
    def test_matches_single_device(self, mesh, rng):
        M = 128 * 4
        trans = Affine3D.identity()
        from_xyz = jnp.asarray(rng.uniform(0, 50, (M, 3)).astype(np.float32))
        to_xyz = from_xyz + jnp.asarray([1.0, -0.5, 0.25])
        proj = jnp.broadcast_to(jnp.eye(3), (M, 3, 3))
        w = jnp.asarray(rng.uniform(0.1, 1.0, M).astype(np.float32))

        want_AtA, want_Atb = normal_equations_terms(trans, from_xyz, to_xyz, proj, w)

        spec = NamedSharding(mesh, P("mp"))
        AtA, Atb = distributed_normal_equations(
            mesh,
            trans,
            jax.device_put(from_xyz, spec),
            jax.device_put(to_xyz, spec),
            jax.device_put(proj, spec),
            jax.device_put(w, spec),
        )
        np.testing.assert_allclose(np.asarray(AtA), np.asarray(want_AtA), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(Atb), np.asarray(want_Atb), rtol=1e-4)

    def test_solution_correct(self, mesh, rng):
        M = 128 * 4
        true = Affine3D(
            A=jnp.eye(3) + 0.01 * jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32)),
            t=jnp.asarray([2.0, 1.0, -1.0]),
            center=jnp.zeros(3),
        )
        from_xyz = jnp.asarray(rng.uniform(0, 50, (M, 3)).astype(np.float32))
        to_xyz = true.apply(from_xyz)
        proj = jnp.broadcast_to(jnp.eye(3), (M, 3, 3))
        w = jnp.ones(M)
        spec = NamedSharding(mesh, P("mp"))
        AtA, Atb = distributed_normal_equations(
            mesh, Affine3D.identity(),
            jax.device_put(from_xyz, spec), jax.device_put(to_xyz, spec),
            jax.device_put(proj, spec), jax.device_put(w, spec),
        )
        theta = jnp.linalg.solve(AtA + 1e-6 * jnp.eye(12), Atb)
        est = Affine3D.from_theta(theta, jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(est.A), np.asarray(true.A), atol=1e-3)


class TestShardCandidates:
    def test_placement(self, mesh, rng):
        x = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
        sharded = shard_candidates(mesh, x)
        assert len(sharded.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(x))


class TestGraftEntry:
    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert np.isfinite(np.asarray(out.trans.t)).all()

    def test_dryrun_multichip(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestSpatialSharding:
    def test_sharded_score_matches_single_device(self, rng):
        from jax.sharding import Mesh
        from lrr_tpu.features.extract import _score_and_outer
        from lrr_tpu.ops import filters
        from lrr_tpu.parallel import sharded_feature_score

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))

        vol = jnp.asarray(rng.standard_normal((64, 24, 24)), jnp.float32)
        spacing = (1.0, 1.0, 1.0)
        grad = filters.gaussian_gradient(vol, 1.0, spacing)
        score_ref, outer_ref = _score_and_outer(grad)

        score, outer = sharded_feature_score(vol, 1.0, spacing, mesh)
        np.testing.assert_allclose(
            np.asarray(score), np.asarray(score_ref), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(outer), np.asarray(outer_ref), rtol=1e-4, atol=1e-5
        )

    def test_sharded_voronoi_build_bitexact(self, rng):
        """The z-slab shard_map exact build equals the single-device map
        voxel-for-voxel (SURVEY §2.5 P1 applied to compute_distance_map)."""
        from jax.sharding import Mesh
        from lrr_tpu.ops.voronoi import build_feature_voronoi

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))

        xyz = jnp.asarray(rng.uniform(0, 60, (256, 3)).astype(np.float32))
        mask = jnp.asarray(rng.uniform(size=256) > 0.1)
        vol0, org0, sp0 = build_feature_voronoi(xyz, mask)
        vol1, org1, sp1 = build_feature_voronoi(xyz, mask, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(vol0), np.asarray(vol1))
        np.testing.assert_array_equal(np.asarray(org0), np.asarray(org1))

    @pytest.mark.slow
    def test_sharded_prepare_pair_matches(self, rng):
        """prepare_pair(mesh=) — stage 1 spatially sharded end-to-end —
        matches the single-device context (features to float tolerance,
        Voronoi maps voxel-exact when the feature sets agree bitwise)."""
        from jax.sharding import Mesh
        from lrr_tpu.config import (
            DescriptorConfig, EstimationConfig, FeatureConfig,
            IndexingConfig, KeypointConfig, PipelineConfig,
        )
        from lrr_tpu.pipeline import prepare_pair
        from lrr_tpu.utils.synthetic import make_pair

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))

        cfg = PipelineConfig(
            features=FeatureConfig(max_features=512, contrast_radius_mm=100.0),
            keypoints=KeypointConfig(max_keypoints=32),
            descriptors=DescriptorConfig(min_neighbors=8, max_neighbors=64),
            indexing=IndexingConfig(num_candidates=4, max_query_keypoints=8),
            estimation=EstimationConfig(
                max_matches=256, max_iterations=5, min_region_features=16
            ),
        )
        fixed, moving, _ = make_pair(
            (32, 32, 32), rotation_deg=4.0, translation=(2.0, -1.0, 0.5)
        )
        ctx0 = prepare_pair(moving, fixed, cfg)
        ctx1 = prepare_pair(moving, fixed, cfg, mesh=mesh)

        np.testing.assert_allclose(
            np.asarray(ctx1.moving_features.xyz),
            np.asarray(ctx0.moving_features.xyz),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(ctx1.moving_features.mask),
            np.asarray(ctx0.moving_features.mask),
        )
        if np.array_equal(
            np.asarray(ctx1.fixed_features.xyz),
            np.asarray(ctx0.fixed_features.xyz),
        ):
            np.testing.assert_array_equal(
                np.asarray(ctx1.fixed_vor.index_vol),
                np.asarray(ctx0.fixed_vor.index_vol),
            )

    def test_halo_exchange_roundtrip(self, rng):
        from jax.sharding import Mesh, PartitionSpec
        from lrr_tpu.parallel import halo_exchange

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
        x = jnp.asarray(rng.standard_normal((16, 5)), jnp.float32)

        def local(b):
            return halo_exchange(b, 2, "sp")

        ext = jax.shard_map(
            local, mesh=mesh, in_specs=PartitionSpec("sp"),
            out_specs=PartitionSpec("sp"),
        )(x)
        ext = np.asarray(ext).reshape(4, 8, 5)
        xs = np.asarray(x).reshape(4, 4, 5)
        # interior neighbor slabs
        np.testing.assert_array_equal(ext[1, :2], xs[0, -2:])
        np.testing.assert_array_equal(ext[1, -2:], xs[2, :2])
        # edge replication at the outer boundaries
        np.testing.assert_array_equal(ext[0, 0], xs[0, 0])
        np.testing.assert_array_equal(ext[0, 1], xs[0, 0])
        np.testing.assert_array_equal(ext[3, -1], xs[3, -1])

"""Weak-scaling harness smoke test on the virtual mesh (the machinery is
what's validated here; CPU interpret-mode timings carry no meaning)."""

from stencil_tpu.scaling import run_weak_scaling


def test_weak_scaling_runs():
    msgs = []
    pts = run_weak_scaling(
        local_shape=(8, 16, 24), spec_name="jacobi7", temporal=2,
        mesh_sizes=[1, 2], progress=msgs.append,
    )
    assert [p.n_devices for p in pts] == [1, 2]
    assert pts[0].efficiency == 1.0
    assert pts[1].global_shape == (16, 16, 24)
    assert all("GLUPS" in m for m in msgs)

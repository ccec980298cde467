"""Multi-host execution smoke test (SURVEY.md section 5.8).

Spawns two REAL OS processes, each owning two virtual CPU devices, that
join one global 4-device mesh via jax.distributed (Gloo collectives) and
run the framework's actual programs — sharded reductions, per-host
black-box likelihood fan-out, the adaptive t-pCN sweep, and TWO full
end-to-end `Sampler.run()` inferences (device-resident loop with a
traceable likelihood; host orchestration with a black-box likelihood
fanned out per process via shard_callback).  This is the TPU-native
counterpart of the reference's `mpiexec -n 2` integration story
(/root/reference/pocomc/parallel.py:20-178); the workers must produce
bit-identical global results (launch() enforces checksum agreement).
"""

from pocomc_tpu.parallel.smoke import launch


def test_two_process_mesh_end_to_end():
    lines = launch(num_processes=2, n_local=2)
    assert len(lines) == 2
    for ln in lines:
        assert "devices=4" in ln
        # each process's callback saw at most its local rows (16 of 64)
        assert int(ln.split("local_batch_max=")[1].split()[0]) <= 32
        # the full Sampler.run() cases completed with finite evidence
        assert "run_logz_dev=" in ln and "run_logz_host=" in ln
        assert "nan" not in ln

"""2-process multi-host worker: builds the x-slab-decomposed 2D warm-rain
case over a process-spanning 8-device mesh (2 processes x 4 emulated CPU
devices, localhost Gloo) and prints global diagnostics as one JSON line.

Run by ``tests/distributed/test_multihost.py`` — not a test module itself."""

import json
import os
import re
import sys


def main():
    # the pytest parent exports xla_force_host_platform_device_count=8;
    # this worker wants jax_num_cpu_devices=4 per process instead
    os.environ["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        os.environ.get("XLA_FLAGS", ""),
    ).strip()

    process_id = int(sys.argv[1])
    port = sys.argv[2]
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    from pysdm_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
        local_device_count=4,
        platform="cpu",
    )

    import jax

    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    assert len(jax.local_devices()) == 4

    from pysdm_tpu.models.arabas_et_al_2015 import Settings
    from pysdm_tpu.parallel import DistributedSimulation2D
    from pysdm_tpu.physics import Formulae, si

    if "crosswind" in sys.argv:
        # sustained strong horizontal flow (courant_x ~ 0.85): every
        # particle streams across slab AND process boundaries every few
        # steps, holding migration near its per-step capacity (the
        # smoke-test analogue: tests/smoke/test_distributed_2d.py
        # _CrosswindSettings)
        class _Crosswind(Settings):
            def stream_function(self, xX, zZ, _):
                return -17.5 * self.size[1] * zZ

        settings_cls = _Crosswind
    else:
        settings_cls = Settings
    settings = settings_cls(
        Formulae(seed=17),
        grid=(16, 8),
        size=(1500 * si.m, 1500 * si.m),
        dt=5 * si.s,
        n_sd_per_gridbox=8,
    )
    sim = DistributedSimulation2D(settings, n_shards=8)
    d0 = sim.global_diagnostics()
    sim.run(n_steps)
    sim.particulator.block_until_ready()
    d1 = sim.global_diagnostics()
    print(
        json.dumps({"process_id": process_id, "before": d0, "after": d1}),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Seeding dynamic (parity: reference ``PySDM/dynamics/seeding.py`` +
``backends/impl_numba/methods/seeding_methods.py``): time-dependent injection
of super-particles into multiplicity-0 (grave) slots. The simulation must be
built with enough NaN-multiplicity particles (discretised to zeros) to hold
the injections. Vectorized: free slots are found by a stable sort, the number
to inject is a traced value (masked placement), and seed choice uses a
jax.random permutation of the seed pool."""

import jax
import jax.numpy as jnp
import numpy as np

from ..initialisation.discretise_multiplicities import discretise_multiplicities


class Seeding:
    # injecting particles into grave slots breaks cell-sorted order
    breaks_cell_sort = True

    def __init__(
        self,
        *,
        super_droplet_injection_rate: callable,
        seeded_particle_extensive_attributes: dict,
        seeded_particle_multiplicity,
    ):
        self.particulator = None
        self.super_droplet_injection_rate = super_droplet_injection_rate
        self.seeded_particle_extensive_attributes = (
            seeded_particle_extensive_attributes
        )
        self.seeded_particle_multiplicity = np.asarray(
            seeded_particle_multiplicity
        )

    def register(self, builder):
        self.particulator = builder.particulator
        for name in self.seeded_particle_extensive_attributes:
            builder.request_attribute(name)

    def make_step(self, particulator):
        from ..impl.attributes import canonical_ext_name

        dt = particulator.dt
        rate_fn = self.super_droplet_injection_rate
        ftype = particulator.dtype
        seed_mult = jnp.asarray(
            discretise_multiplicities(self.seeded_particle_multiplicity),
            dtype=particulator.mult_dtype,
        )
        n_pool = seed_mult.shape[0]

        def step(sim):
            particles = sim["particles"]
            key = sim["key"]
            # traced per-step injection count from the user callable
            t = sim["env"].get("t", jnp.zeros((), ftype))
            try:
                n_inject = jnp.asarray(rate_fn(t), dtype=jnp.int32)
            except (jax.errors.TracerArrayConversionError, TypeError):
                n_inject = jax.pure_callback(
                    lambda tt: np.asarray(rate_fn(float(tt)), dtype=np.int32),
                    jax.ShapeDtypeStruct((), jnp.int32),
                    t,
                )

            seed_ext = jnp.stack(
                [
                    jnp.asarray(
                        self.seeded_particle_extensive_attributes[
                            _orig_name(name, self.seeded_particle_extensive_attributes)
                        ],
                        dtype=ftype,
                    )
                    for name in particles.ext_names
                ]
            )

            key, sub = jax.random.split(key)
            perm = jax.random.permutation(sub, n_pool)
            mult = particles.multiplicity
            free = mult <= 0
            n_sd = mult.shape[0]
            free_order = jnp.argsort(~free)  # free slots first, stable
            slots = free_order[:n_pool] if n_pool < n_sd else free_order
            k = slots.shape[0]
            ok = (jnp.arange(k) < n_inject) & (jnp.arange(k) < jnp.sum(free))
            safe_slots = jnp.where(ok, slots, n_sd)  # OOB -> dropped
            src = perm[: k]
            mult = mult.at[safe_slots].set(seed_mult[src], mode="drop")
            ext = particles.extensive.at[:, safe_slots].set(
                seed_ext[:, src], mode="drop"
            )
            particles = particles.replace(multiplicity=mult, extensive=ext)
            return {**sim, "particles": particles, "key": key}

        return step


def _orig_name(canonical, mapping):
    """map a canonical extensive name back to the user-supplied key"""
    from ..impl.attributes import canonical_ext_name

    for k in mapping:
        if canonical_ext_name(k) == canonical:
            return k
    raise KeyError(
        f"seeded_particle_extensive_attributes missing {canonical!r}"
        f" (got {list(mapping)})"
    )

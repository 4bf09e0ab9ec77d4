"""kappa-Koehler hygroscopicity variants
(parity: reference ``PySDM/physics/hygroscopicity/``, Petters & Kreidenweis 2007)."""

import jax.numpy as jnp


class KappaKoehler:
    @staticmethod
    def RH_eq(const, r, T, kp, rd3, sgm):
        return (
            jnp.exp((2 * sgm / const.Rv / T / const.rho_w) / r)
            * (r**3 - rd3)
            / (r**3 - rd3 * (1 - kp))
        )

    @staticmethod
    def r_cr(const, kp, rd3, T, sgm):
        return jnp.sqrt(3 * kp * rd3 / (2 * sgm / const.Rv / T / const.rho_w))


class KappaKoehlerLeadingTerms:
    @staticmethod
    def RH_eq(const, r, T, kp, rd3, sgm):
        return (
            1
            + (2 * sgm / const.Rv / T / const.rho_w) / r
            - kp * rd3 / jnp.power(r, const.THREE)
        )

    @staticmethod
    def r_cr(const, kp, rd3, T, sgm):
        return jnp.sqrt(3 * kp * rd3 / (2 * sgm / const.Rv / T / const.rho_w))


VARIANTS = {
    "KappaKoehler": KappaKoehler,
    "KappaKoehlerLeadingTerms": KappaKoehlerLeadingTerms,
}

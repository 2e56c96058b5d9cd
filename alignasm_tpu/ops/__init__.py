"""Device kernels.  The PafDistance semiring needs exact 64-bit integer
arithmetic (score sums reach 2^35, packed keys 2^60), so x64 must be on
before any kernel traces."""

import jax

jax.config.update("jax_enable_x64", True)

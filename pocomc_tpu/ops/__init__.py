from .weights import (effective_sample_size, unique_sample_size,
                      compute_ess, increment_logz, trim_weights,
                      compute_logw_and_logz, bisect_beta,
                      ess_jax, uss_jax, compute_logw_and_logz_jax)
from .resampling import (systematic_resample, multinomial_resample,
                         systematic_resample_jax, multinomial_resample_jax)

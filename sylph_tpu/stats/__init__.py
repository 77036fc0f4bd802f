from .wyrand import WyRand, wyrand_indices
from .inference import (mean_u32, var_u32, ratio_lambda, mle_zip, mme_lambda,
                        binary_search_lambda)
from .contain_stats import StatParams, coverage_stats

"""AOT warmup: after warmup_optimizer, a real BO run of the same shape
must not trigger any new chain/ML-II/posterior/acquisition compiles."""

import numpy as np

from bask_tpu import Optimizer
from bask_tpu.models import bayesgpr as bg
from bask_tpu.utils.warmup import warmup_optimizer


def test_warmup_precompiles_tell_path():
    opt = Optimizer(
        dimensions=[(0.0, 1.0), (0.0, 1.0)],
        n_points=64,
        n_initial_points=2,
        init_strategy="random",
        acq_func="ei",
        random_state=1,
    )
    buckets = warmup_optimizer(
        opt, n_observations=(2, 3, 4), gp_samples=20, gp_burnin=2, n_samples=3
    )
    assert buckets == [64]

    from bask_tpu import acquisition as acq_mod

    sizes = {
        "chain": bg._run_chain._cache_size(),
        "ml2": bg._lml_value_grad._cache_size(),
        "post": bg._posterior_robust._cache_size(),
        "acq": acq_mod._per_draw_predictions._cache_size(),
        # the warm-tell overlap programs: the fused sample, the fused
        # marginal acquisition, and the packed-single-fetch concat
        "fused_sample": bg._fused_sample._cache_size(),
        "fused_acq": acq_mod._fused_marginal_vals._cache_size(),
        "pack": bg._pack_fetch._cache_size(),
    }

    rng = np.random.RandomState(0)
    for _ in range(3):
        x = opt.ask()
        opt.tell(
            x,
            float(np.sin(3 * x[0]) + 0.05 * rng.randn()),
            n_samples=3,
            gp_samples=20,
            gp_burnin=2,
        )

    assert bg._run_chain._cache_size() == sizes["chain"]
    assert bg._lml_value_grad._cache_size() == sizes["ml2"]
    assert bg._posterior_robust._cache_size() == sizes["post"]
    assert acq_mod._per_draw_predictions._cache_size() == sizes["acq"]
    assert bg._fused_sample._cache_size() == sizes["fused_sample"]
    assert acq_mod._fused_marginal_vals._cache_size() == sizes["fused_acq"]
    assert bg._pack_fetch._cache_size() == sizes["pack"]


def test_warmup_is_silent_on_throwaway_convergence():
    """The warmup's compile-priming cold tell runs exactly one
    until_rhat extension leg by design; its (meaningless) budget
    warning on the synthetic throwaway posterior must not surface."""
    import warnings

    opt = Optimizer(
        dimensions=[(0.0, 1.0), (0.0, 1.0)],
        n_points=32,
        n_initial_points=2,
        init_strategy="random",
        acq_func="ei",
        random_state=1,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        warnings.filterwarnings(  # unrelated guards may still fire
            "default", message="(?!.*did not reach R-hat).*"
        )
        warmup_optimizer(
            opt, n_observations=(2,), gp_samples=20, gp_burnin=2, n_samples=3
        )


def test_warmup_covers_polish_programs():
    """A polished loop (Optimizer(acq_polish=)) must be warmed with the
    polish ascent programs — n_steps/lr are jit statics, so an
    unpolished warmup would stall the first real tell on a compile."""
    from bask_tpu import acquisition as acq_mod

    opt = Optimizer(
        dimensions=[(0.0, 1.0)],
        n_points=32,
        n_initial_points=2,
        init_strategy="random",
        acq_func="ei",
        random_state=1,
        acq_polish=3,
        acq_polish_starts=2,
    )
    warmup_optimizer(
        opt, n_observations=(2, 3), gp_samples=20, gp_burnin=2, n_samples=3
    )
    n_polish = acq_mod._polish_marginal_vals._cache_size()
    assert n_polish > 0  # the warmup actually exercised the polish

    rng = np.random.RandomState(0)
    for _ in range(2):
        x = opt.ask()
        opt.tell(
            x,
            float(np.sin(3 * x[0]) + 0.05 * rng.randn()),
            n_samples=3,
            gp_samples=20,
            gp_burnin=2,
        )
    assert acq_mod._polish_marginal_vals._cache_size() == n_polish


def test_warmup_covers_move_mixture_programs():
    """A demix loop (gp_sample_kwargs / BayesGPR(moves=)) must be
    warmed with the MIXTURE chain program — the moves tuple is a jit
    static, so a stretch-warmed cache would recompile mid-run."""
    opt = Optimizer(
        dimensions=[(0.0, 1.0)],
        n_points=32,
        n_initial_points=2,
        init_strategy="random",
        acq_func="ei",
        random_state=1,
        gp_sample_kwargs={"moves": "demix"},
    )
    warmup_optimizer(
        opt, n_observations=(2, 3), gp_samples=20, gp_burnin=2, n_samples=3
    )
    n_fused = bg._fused_sample._cache_size()

    rng = np.random.RandomState(0)
    for _ in range(2):
        x = opt.ask()
        opt.tell(
            x,
            float(np.sin(3 * x[0]) + 0.05 * rng.randn()),
            n_samples=3,
            gp_samples=20,
            gp_burnin=2,
        )
    assert bg._fused_sample._cache_size() == n_fused

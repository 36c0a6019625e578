"""Build the two executed tutorial notebooks.

Constructs ``examples/Fit-GP.ipynb`` and
``examples/Optimize-1D-function.ipynb`` — the bask-tpu equivalents of the
reference's two tutorial notebooks (``/root/reference/examples/*.ipynb``)
— by executing every code cell in-process on the CPU backend and
capturing stdout / matplotlib figures into real notebook outputs
(nbclient/jupyter kernels are not available in this environment).

Run:  python docs/build_notebooks.py
"""

import ast
import base64
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")

import nbformat as nbf


def _run_cell(src, ns):
    import matplotlib.pyplot as plt

    stdout = io.StringIO()
    tree = ast.parse(src)
    tail = None
    if tree.body and isinstance(tree.body[-1], ast.Expr):
        tail = ast.Expression(tree.body.pop(-1).value)
    with contextlib.redirect_stdout(stdout):
        exec(compile(tree, "<cell>", "exec"), ns)
        result = (
            eval(compile(tail, "<cell>", "eval"), ns) if tail is not None else None
        )
    outputs = []
    if stdout.getvalue():
        outputs.append(
            nbf.v4.new_output("stream", name="stdout", text=stdout.getvalue())
        )
    for num in plt.get_fignums():
        buf = io.BytesIO()
        plt.figure(num).savefig(buf, format="png", dpi=110, bbox_inches="tight")
        outputs.append(
            nbf.v4.new_output(
                "display_data",
                data={"image/png": base64.b64encode(buf.getvalue()).decode()},
            )
        )
    plt.close("all")
    if result is not None:
        outputs.append(
            nbf.v4.new_output(
                "execute_result",
                data={"text/plain": repr(result)},
                execution_count=None,
            )
        )
    return outputs


def build(cells, path):
    nb = nbf.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3",
        "language": "python",
        "name": "python3",
    }
    ns = {}
    count = 0
    for kind, src in cells:
        src = src.strip("\n")
        if kind == "md":
            nb.cells.append(nbf.v4.new_markdown_cell(src))
            continue
        count += 1
        cell = nbf.v4.new_code_cell(src, execution_count=count)
        cell.outputs = _run_cell(src, ns)
        nb.cells.append(cell)
    nbf.write(nb, path)
    print(f"wrote {path} ({count} code cells executed)")


# ---------------------------------------------------------------------------
# shared style / palette cells (validated categorical palette: blue #2a78d6,
# orange #eb6834; neutral ink #52514e for raw data; recessive grid)

SETUP = """
import jax

# This notebook was executed on the CPU backend for reproducibility.
# On a TPU VM, delete the next line — JAX selects the TPU automatically
# and every fit below runs the fused Pallas/blocked-Cholesky fast path.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import matplotlib.pyplot as plt

C_BLUE, C_ORANGE, C_INK = "#2a78d6", "#eb6834", "#52514e"
plt.rcParams.update({
    "axes.grid": True, "grid.alpha": 0.25, "axes.axisbelow": True,
    "figure.facecolor": "white", "axes.spines.top": False,
    "axes.spines.right": False,
})
"""

FIT_GP = [
    (
        "md",
        """
# Fitting a fully-Bayesian Gaussian process

bask-tpu treats the kernel hyperparameters of a Gaussian process as
*random variables*: instead of a single maximum-likelihood point
estimate, `BayesGPR.fit` runs an on-device affine-invariant ensemble
MCMC over them and summarizes the hyperposterior at its geometric
median. This tutorial fits such a GP to noisy 1-D data and reads out
the posterior mean, its uncertainty, and function realizations.

(bask-tpu equivalent of the reference tutorial
`examples/Fit-GP.ipynb`.)
""",
    ),
    ("code", SETUP + "\nfrom bask_tpu import BayesGPR"),
    (
        "md",
        """
## A noisy toy dataset

100 observations of a sine with Gaussian noise of standard deviation
0.3 — enough noise that the hyperposterior is genuinely uncertain.
""",
    ),
    (
        "code",
        """
rand = np.random.RandomState(123)
n_points, noise, frequency = 100, 0.3, 3.0
X = rand.uniform(-1, 1, size=(n_points, 1))
y = np.sin(X[:, 0] * frequency) + rand.randn(n_points) * noise
""",
    ),
    (
        "code",
        """
fig, ax = plt.subplots(figsize=(9, 5))
xx = np.linspace(-1, 1, num=200)
ax.plot(xx, np.sin(xx * frequency), color=C_ORANGE, lw=2,
        label="f(x) (noise-free)")
ax.plot(X[:, 0], y, "o", ms=5, color=C_INK, alpha=0.6, label="Noisy data")
ax.set_xlabel("x"); ax.set_ylabel("y"); ax.legend()
ax.set_title("Training data")
plt.show()
""",
    ),
    (
        "md",
        """
## Kernel and hyperparameter priors

A GP needs a kernel and — since we are fully Bayesian — a prior for
each (log-scale) hyperparameter. We use the standard
`Constant * Matern(nu=2.5)` kernel; `noise="gaussian"` (the default)
appends a `WhiteKernel` at fit time, so three priors are required:
signal variance, length scale, and noise variance. Half-normal priors
are vague enough for the two variances; the "round-flat" prior keeps
the length scale in a sensible range while staying flat where the data
can speak.

Priors are written with `jax.numpy` so the whole MCMC log-probability
stays on device. (SciPy-style priors ported from reference code also
work unmodified — bask-tpu routes non-traceable callables through a
host callback, at a throughput cost on TPU.)
""",
    ),
    (
        "code",
        """
import math
import jax.numpy as jnp

from bask_tpu.ops.kernels import ConstantKernel, Matern
from bask_tpu.utils.priors import make_roundflat

kernel = ConstantKernel(1.0, (0.1, 10.0)) * Matern(
    1.0, (0.05, 5.0), nu=2.5
)

def variance_prior(x):
    # half-normal(scale=2) on the standard deviation, with the
    # log-space change-of-variables Jacobian
    return (
        0.5 * math.log(2.0 / math.pi) - math.log(2.0)
        - jnp.exp(x) / 8.0
        + x / 2.0 - math.log(2.0)
    )

roundflat = make_roundflat()
priors = [
    variance_prior,                        # signal variance
    lambda x: roundflat(jnp.exp(x)) + x,   # length scale
    variance_prior,                        # noise variance
]
""",
    ),
    (
        "md",
        """
## Fit

`fit` first runs an ML-II warm start (L-BFGS on the exact JAX-grad
log-marginal likelihood), then advances 100 stretch-move walkers on
device — every walker's Matérn gram, Cholesky factorization and LML in
one batched program per half-step.
""",
    ),
    (
        "code",
        """
import time

gp = BayesGPR(kernel=kernel, normalize_y=True, random_state=17)
t0 = time.perf_counter()
gp.fit(X, y, n_desired_samples=100, n_burnin=100, priors=priors,
       progress=False)
print(f"wall time: {time.perf_counter() - t0:.1f} s")
print(f"hyperposterior chain: {gp.chain_.shape}")
print(f"consensus kernel (geometric median): {gp.kernel_}")
print(f"estimated noise variance: {gp.noise_:.4f}  (true {noise**2:.2f})")
""",
    ),
    (
        "md",
        """
## Posterior mean and uncertainty

`predict(return_std=True)` reads the consensus GP. One and two
predictive standard deviations around the mean:
""",
    ),
    (
        "code",
        """
xx = np.linspace(-1, 1, num=200)[:, None]
mu, std = gp.predict(xx, return_std=True)

fig, ax = plt.subplots(figsize=(9, 5))
ax.plot(X[:, 0], y, "o", ms=5, color=C_INK, alpha=0.4, label="Noisy data")
ax.plot(xx[:, 0], mu, color=C_BLUE, lw=2, label="GP mean")
for k, a in ((1, 0.25), (2, 0.12)):
    ax.fill_between(xx[:, 0], mu - k * std, mu + k * std,
                    color=C_BLUE, alpha=a, lw=0)
ax.plot(xx[:, 0], np.sin(xx[:, 0] * frequency), color=C_ORANGE, lw=2,
        ls="--", label="f(x) (noise-free)")
ax.set_xlabel("x"); ax.set_ylabel("y"); ax.legend()
ax.set_title("Consensus GP posterior (bands: ±1σ, ±2σ)")
plt.show()
""",
    ),
    (
        "md",
        """
## Function realizations

`sample_y(sample_mean=True)` draws joint realizations from the
*consensus* GP (kernel fixed at the geometric median):
""",
    ),
    (
        "code",
        """
YY = gp.sample_y(xx, n_samples=20, sample_mean=True, random_state=3)

fig, ax = plt.subplots(figsize=(9, 5))
ax.plot(xx[:, 0], np.asarray(YY), color=C_BLUE, alpha=0.25, lw=1)
ax.plot(X[:, 0], y, "o", ms=5, color=C_INK, alpha=0.4, label="Noisy data")
ax.plot([], [], color=C_BLUE, lw=1, label="consensus-GP draws")
ax.set_xlabel("x"); ax.set_ylabel("y"); ax.legend()
ax.set_title("20 realizations of the consensus GP")
plt.show()
""",
    ),
    (
        "md",
        """
With `sample_mean=False` each realization instead uses a *different*
hyperposterior sample — one fused, vmapped pass over random chain rows
(the reference loops in Python here). The extra hyperparameter
uncertainty makes these draws visibly rougher:
""",
    ),
    (
        "code",
        """
YY = gp.sample_y(xx, n_samples=20, sample_mean=False, random_state=3)

fig, ax = plt.subplots(figsize=(9, 5))
ax.plot(xx[:, 0], np.asarray(YY), color=C_BLUE, alpha=0.25, lw=1)
ax.plot(X[:, 0], y, "o", ms=5, color=C_INK, alpha=0.4, label="Noisy data")
ax.plot([], [], color=C_BLUE, lw=1, label="hyperposterior draws")
ax.set_xlabel("x"); ax.set_ylabel("y"); ax.legend()
ax.set_title("20 realizations marginalized over the hyperposterior")
plt.show()
""",
    ),
    (
        "md",
        """
Each of those 20 curves corresponds to a different plausible kernel —
length scale, signal variance and noise all vary — which is exactly the
uncertainty a point-estimate GP ignores.

## Did the chain converge?

`mcmc_diagnostics()` reports split R-hat, effective sample size and the
integrated autocorrelation time of the hyperposterior chain (per
log-hyperparameter: signal variance, length scale, noise). R-hat near 1
and ESS in the hundreds mean the consensus model and the marginalized
predictions above are trustworthy:
""",
    ),
    (
        "code",
        """
gp.fit(X, y, n_desired_samples=20000, n_burnin=100, priors=priors,
       progress=False)
diag = gp.mcmc_diagnostics()
for k in ("rhat", "ess", "autocorr_time"):
    print(f"{k:>14}: {np.round(diag[k], 2)}")
print(f"    acceptance: {diag['acceptance']:.2f}  "
      f"({diag['n_steps']} steps x {diag['n_walkers']} walkers)")
""",
    ),
]


OPT_1D = [
    (
        "md",
        """
# Optimizing a noisy 1-D function

The `Optimizer` drives the classic ask/tell loop: propose a point,
evaluate the (noisy) objective, report the value back, repeat. Under
the hood every `tell` refits the fully-Bayesian GP (warm-started from
the previous hyperposterior) and maximizes an acquisition function
marginalized over hyperposterior samples — all on device.

(bask-tpu equivalent of the reference tutorial
`examples/Optimize-1D-function.ipynb`.)
""",
    ),
    ("code", SETUP + "\nfrom bask_tpu import Optimizer"),
    (
        "md",
        """
## The target function

A classic multimodal test problem on [0, 1.2] with four local minima,
two of which are close in value — observed through Gaussian noise of
standard deviation 0.1.
""",
    ),
    (
        "code",
        """
def test_function(x):
    return -(1.4 - 3.0 * x) * np.sin(18.0 * x)

rand = np.random.RandomState(123)
noise = 0.1
""",
    ),
    (
        "code",
        """
fig, ax = plt.subplots(figsize=(9, 5))
xx = np.linspace(0, 1.2, num=300)
ax.plot(xx, test_function(xx), color=C_ORANGE, lw=2, label="f(x)")
ax.axvline(0.96609, color=C_INK, lw=1, ls=":", label="global minimum")
ax.set_xlabel("x"); ax.set_ylabel("y"); ax.legend()
ax.set_title("Target function (noise-free)")
plt.show()
""",
    ),
    (
        "md",
        """
## Setting up the optimizer

One `(low, high)` tuple per parameter, the default
`Constant * Matern(nu=2.5)`-plus-noise kernel family, and one prior per
log-hyperparameter (signal variance, length scale, noise variance —
dimensions + 2). The default acquisition, predictive-variance-reduction
search ("pvrs"), balances exploration and exploitation well without
tuning.
""",
    ),
    (
        "code",
        """
import math
import jax.numpy as jnp

from bask_tpu.ops.kernels import ConstantKernel, Matern
from bask_tpu.utils.priors import make_roundflat

parameters = [(0.0, 1.2)]
kernel = ConstantKernel(1.0, (0.1, 10.0)) * Matern(1.0, (0.05, 5.0), nu=2.5)

def variance_prior(x):
    return (
        0.5 * math.log(2.0 / math.pi) - math.log(2.0)
        - jnp.exp(x) / 8.0
        + x / 2.0 - math.log(2.0)
    )

roundflat = make_roundflat()
priors = [
    variance_prior,
    lambda x: roundflat(jnp.exp(x)) + x,
    variance_prior,
]

n_initial_points = 2
opt = Optimizer(
    parameters,
    n_points=50,
    n_initial_points=n_initial_points,
    init_strategy="sb",
    gp_kernel=kernel,
    gp_kwargs=dict(normalize_y=True),
    gp_priors=priors,
    acq_func="pvrs",
    random_state=456,
)
""",
    ),
    (
        "md",
        """
## Running the loop

32 iterations (2 low-discrepancy initial points + 30 acquisition-driven
ones). After each `tell` we record the GP posterior on a grid so the
progress can be replayed below.
""",
    ),
    (
        "code",
        """
import time

n_iterations = 30 + n_initial_points
n_grid = 200
xx = np.linspace(0, 1.2, num=n_grid)
means = np.full((n_iterations, n_grid), np.nan)
stds = np.full((n_iterations, n_grid), np.nan)

t0 = time.perf_counter()
for i in range(n_iterations):
    x = opt.ask()
    value = float(test_function(x[0]) + rand.randn() * noise)
    opt.tell(x, value, n_samples=0, gp_samples=100, gp_burnin=5)
    if opt.gp.chain_ is not None:
        means[i], stds[i] = opt.gp.predict(
            opt.space.transform(xx[:, None].tolist()), return_std=True
        )
print(f"{n_iterations} ask/tell iterations: "
      f"{time.perf_counter() - t0:.1f} s")
print(f"best observed: x={opt.Xi[int(np.argmin(opt.yi))][0]:.4f}  "
      f"y={min(opt.yi):.4f}")
""",
    ),
    (
        "md",
        """
## Replaying the iterations

GP mean ±1σ and the evaluated points after 3, 10, 16, 24 and 32
iterations. Watch the posterior sharpen around the two competitive
minima and the proposals concentrate on the global one.
""",
    ),
    (
        "code",
        """
yy = test_function(xx)
it_to_plot = [2, 9, 15, 23, 31]
fig, axes = plt.subplots(ncols=1, nrows=len(it_to_plot),
                         figsize=(9, 11), sharex=True, sharey=True)
for ax, i in zip(axes, it_to_plot):
    ax.plot(xx, yy, color=C_ORANGE, lw=1.5, label="f(x)")
    ax.plot(xx, means[i], color=C_BLUE, lw=2, label="GP mean")
    ax.fill_between(xx, means[i] - stds[i], means[i] + stds[i],
                    color=C_BLUE, alpha=0.2, lw=0)
    pts = np.asarray(opt.Xi[: i + 1]).ravel()
    ax.plot(pts, opt.yi[: i + 1], "o", ms=5, color=C_INK, alpha=0.6,
            label="evaluations")
    ax.set_ylabel(f"iter {i + 1}")
axes[0].legend(loc="upper left", ncols=3)
axes[-1].set_xlabel("x")
fig.suptitle("Posterior after selected iterations", y=0.92)
plt.show()
""",
    ),
    (
        "md",
        """
## Extracting the optimum

The best *observed* point is noisy; the minimum of the GP *mean* is the
better estimate of the true optimizer:
""",
    ),
    (
        "code",
        """
from bask_tpu import create_result, expected_minimum

result = create_result(opt.Xi, opt.yi, space=opt.space, models=[opt.gp])
opt_x, opt_y = expected_minimum(result, n_random_starts=100,
                                random_state=0)
print(f"GP-mean minimum: x={opt_x[0]:.4f}  y={opt_y:.4f}")
print("true global minimum: x=0.96609  y=-1.48907")
""",
    ),
    (
        "md",
        """
## Should we stop?

bask-tpu ships the reference's three stopping-rule diagnostics. The
probability that the current GP-mean optimum is within a threshold of
the true optimum, and a 95% highest-density interval for the
optimizer's location:
""",
    ),
    (
        "code",
        """
prob = opt.probability_of_optimality(
    threshold=0.1, n_space_samples=250, n_gp_samples=100,
    n_random_starts=20, random_state=1,
)
print(f"P(optimum within 0.1 of the true one) = {prob:.2f}")

intervals = opt.optimum_intervals(random_state=1, space_samples=250)
print(f"95% HDI for the optimum location: {np.round(intervals[0], 3)}")
""",
    ),
    (
        "md",
        """
Both diagnostics agree the optimum is essentially located — a longer
run would mostly polish the last digits. On a TPU chip the whole loop
above runs in a few seconds once the per-bucket programs are compiled
(see `bask_tpu.utils.warmup.warmup_optimizer`).
""",
    ),
]


if __name__ == "__main__":
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    build(FIT_GP, os.path.join(here, "examples", "Fit-GP.ipynb"))
    build(
        OPT_1D, os.path.join(here, "examples", "Optimize-1D-function.ipynb")
    )

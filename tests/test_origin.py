"""Origin maps + reemission statistics (VERDICT r2 item 11; reference
write_origin output.f90:1366-1420, reemission_stats :1553-1604)."""
import numpy as np
import jax

from mcfost_tpu.config.para import Para
from mcfost_tpu.mc.model import build_model
from mcfost_tpu.mc.thermal_mc import run_thermal_mc
from mcfost_tpu.transfer.sed import run_mc_sed
from mcfost_tpu.io.diagnostics import write_origin, write_reemission_stats
from mcfost_tpu.io.fits import read_fits


def _setup(dust_mass=1e-5):
    para = Para()
    para.grid.n_rad, para.grid.nz, para.grid.n_rad_in = 12, 8, 2
    para.wavelengths.n_lambda = 10
    para.zones[0].dust_mass = dust_mass
    for sp in para.dust[0]:
        sp.n_grains = 6
        sp.amax = 10.0
    return build_model(para, cache_dir="/tmp/mcfost_tpu_test_cache")


def test_origin_tally_conserves_escaped_energy(tmp_path):
    model, host = _setup()
    T = np.full(model.grid.n_cells, 40.0)
    out = run_mc_sed(model, host, T, jax.random.PRNGKey(1),
                     n_per_lambda=600, batch=2048, max_iters=60000,
                     origin=True)
    res = out["res"]
    orig = np.asarray(res.orig, np.float64)
    sed_tot = float(np.asarray(res.sed[..., 0]).sum())
    # every escaped packet was attributed to exactly one origin slot
    assert np.isclose(orig.sum(), sed_tot, rtol=1e-5)
    C = model.grid.n_cells
    o = orig.reshape(-1, C + 1)
    assert o[:, :C].sum() > 0          # disk-origin energy present
    assert o[:, C].sum() > 0           # star-origin energy present
    # warm disk: long-wavelength flux is disk-origin dominated
    frac_disk = o[:, :C].sum(1) / np.maximum(o.sum(1), 1e-300)
    assert frac_disk[-1] > frac_disk[0]

    p = write_origin(model, res.orig, str(tmp_path))
    hdr, arr = read_fits(p)[0]
    arr = np.asarray(arr)
    assert arr.shape == (C,)
    assert 0.0 <= arr.sum() <= 1.0 + 1e-5


def test_reemission_stats_counts(tmp_path):
    model, host = _setup(dust_mass=1e-4)
    res = run_thermal_mc(model, jax.random.PRNGKey(2), 4000, batch=2048,
                         max_iters=100000, nabs_tally=True)
    nabs = np.asarray(res.nabs)
    assert nabs.sum() > 0              # optically thick: reemissions happen
    assert (nabs >= 0).all()
    p = write_reemission_stats(model, res.nabs, str(tmp_path))
    hdr, arr = read_fits(p)[0]
    assert np.asarray(arr).shape == (model.grid.n_cells,)

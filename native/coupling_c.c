/* C ABI for the mcfost_tpu live coupling — the libmcfost.a analogue.
 *
 * The reference ships a static library with C-linkage entry points so
 * Phantom (Fortran) and generic hydro codes (C++) can call the thermal
 * MC in-memory every hydro step (reference: src/Makefile:263-266,
 * src/mcfost2phantom.f90:7,159,535, src/mcfost2hydro.cpp).  Here the
 * compute path is JAX/XLA behind a Python API, so the C surface embeds
 * CPython once and marshals raw f64 arrays through zero-copy
 * memoryviews into mcfost_tpu.coupling's _c_api_* adapters.
 *
 *   int  mcfost_init(const char *para_path, long n_packets);
 *   long mcfost_run_phantom(int n_part, const double *xyz,
 *                           const double *h, const double *mass_g,
 *                           int n_star, const double *star_xyz,
 *                           const double *star_mass_msun,
 *                           const double *dudt_w_or_null,
 *                           double *t_out_k);
 *   int  mcfost_diffusion_opacity(int n_part, const double *t_k,
 *                                 double *kappa_cm2_per_g_out);
 *   int  mcfost_write_default_para(const char *path);
 *   void mcfost_finalize(void);
 *
 * All arrays are caller-owned, C-contiguous double precision; xyz and
 * star_xyz are (N,3) row-major in AU, masses in g (particles) and Msun
 * (sinks), dudt in W per particle (NULL for none), temperatures in K.
 * Every call returns 0/handle on success and a negative value on error
 * (the Python traceback is printed to stderr).
 *
 * Thread-safety: calls must come from one thread (the embedded
 * interpreter holds the GIL across each entry point).
 */
#include <Python.h>
#include <stdio.h>

static PyObject *g_coupling = NULL;   /* mcfost_tpu.coupling module */
static PyObject *g_state = NULL;      /* CouplingState */

static int ensure_python(void)
{
    if (!Py_IsInitialized())
        Py_Initialize();
    if (g_coupling == NULL) {
        /* repo root on sys.path: MCFOST_TPU_ROOT or cwd */
        PyRun_SimpleString(
            "import sys, os\n"
            "_r = os.environ.get('MCFOST_TPU_ROOT', os.getcwd())\n"
            "sys.path.insert(0, _r) if _r not in sys.path else None\n");
        g_coupling = PyImport_ImportModule("mcfost_tpu.coupling");
        if (g_coupling == NULL) {
            PyErr_Print();
            return -1;
        }
    }
    return 0;
}

static PyObject *call_method(const char *name, PyObject *args)
{
    PyObject *fn = PyObject_GetAttrString(g_coupling, name);
    if (fn == NULL) {
        PyErr_Print();
        return NULL;
    }
    PyObject *r = PyObject_CallObject(fn, args);
    Py_DECREF(fn);
    if (r == NULL)
        PyErr_Print();
    return r;
}

static PyObject *mv_ro(const double *p, Py_ssize_t n)
{
    return PyMemoryView_FromMemory((char *)p, n * sizeof(double),
                                   PyBUF_READ);
}

static PyObject *mv_rw(double *p, Py_ssize_t n)
{
    return PyMemoryView_FromMemory((char *)p, n * sizeof(double),
                                   PyBUF_WRITE);
}

int mcfost_write_default_para(const char *path)
{
    if (ensure_python() != 0)
        return -1;
    PyObject *args = Py_BuildValue("(s)", path);
    PyObject *r = call_method("_c_api_write_default_para", args);
    Py_DECREF(args);
    if (r == NULL)
        return -2;
    Py_DECREF(r);
    return 0;
}

int mcfost_init(const char *para_path, long n_packets)
{
    if (ensure_python() != 0)
        return -1;
    PyObject *args = Py_BuildValue("(sl)", para_path, n_packets);
    PyObject *r = call_method("_c_api_init", args);
    Py_DECREF(args);
    if (r == NULL)
        return -2;
    Py_XDECREF(g_state);
    g_state = r;                      /* keep the CouplingState alive */
    return 0;
}

long mcfost_run_phantom(int n_part, const double *xyz, const double *h,
                        const double *mass_g, int n_star,
                        const double *star_xyz,
                        const double *star_mass_msun,
                        const double *dudt_w, double *t_out_k)
{
    if (g_state == NULL) {
        fprintf(stderr, "mcfost_run_phantom: call mcfost_init first\n");
        return -1;
    }
    PyObject *dudt_obj;
    if (dudt_w != NULL)
        dudt_obj = mv_ro(dudt_w, n_part);
    else {
        Py_INCREF(Py_None);
        dudt_obj = Py_None;
    }
    PyObject *args = Py_BuildValue(
        "(OiNNNiNNNN)", g_state, n_part,
        mv_ro(xyz, 3L * n_part), mv_ro(h, n_part), mv_ro(mass_g, n_part),
        n_star, mv_ro(star_xyz, 3L * n_star),
        mv_ro(star_mass_msun, n_star), dudt_obj,
        mv_rw(t_out_k, n_part));
    PyObject *r = call_method("_c_api_run", args);
    Py_DECREF(args);
    if (r == NULL)
        return -2;
    long n_used = PyLong_AsLong(r);
    Py_DECREF(r);
    return n_used;
}

int mcfost_diffusion_opacity(int n_part, const double *t_k,
                             double *kappa_out)
{
    if (g_state == NULL) {
        fprintf(stderr,
                "mcfost_diffusion_opacity: call mcfost_run_phantom "
                "first\n");
        return -1;
    }
    PyObject *args = Py_BuildValue(
        "(OiNN)", g_state, n_part, mv_ro(t_k, n_part),
        mv_rw(kappa_out, n_part));
    PyObject *r = call_method("_c_api_diffusion", args);
    Py_DECREF(args);
    if (r == NULL)
        return -2;
    Py_DECREF(r);
    return 0;
}

void mcfost_finalize(void)
{
    Py_XDECREF(g_state);
    g_state = NULL;
    Py_XDECREF(g_coupling);
    g_coupling = NULL;
    /* the interpreter stays up: JAX runtimes do not survive
       Py_Finalize/Py_Initialize cycles */
}

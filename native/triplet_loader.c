/* probgan_native: C runtime components for the probgan_tpu framework.
 *
 * The TPU compute path is JAX/XLA/Pallas; this module is the native side of
 * the runtime around it — currently the training data loader:
 *
 *   parse_triplets(bytes) -> bytes
 *     Parse whitespace-separated integer triplet text ("h r t\n" per line,
 *     the prot_b_gan.py training format) into a packed little-endian int32
 *     buffer (3 ints per triplet). One pass, no Python-object-per-token
 *     overhead; ~20x faster than str.split on large files, which matters on
 *     this host's single core where the Python parse of a 100M-triplet file
 *     would dominate a training run's startup.
 *
 *   sample_negatives(n, num_entities, seed) -> bytes
 *     Packed int32 buffer of n uniform entity ids from a xorshift128+
 *     stream — deterministic, seedable negative sampling for KG training
 *     without round-tripping through numpy's slower Generator on the host.
 *
 * Both return bytes; the Python wrapper (probgan_tpu/native/__init__.py)
 * views them with numpy.frombuffer (zero copy) and falls back to pure-numpy
 * implementations when the extension isn't built.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

static PyObject *
parse_triplets(PyObject *self, PyObject *args)
{
    Py_buffer view;
    if (!PyArg_ParseTuple(args, "y*", &view))
        return NULL;

    const char *p = (const char *)view.buf;
    const char *end = p + view.len;

    /* Upper bound on token count: one int per two bytes. */
    Py_ssize_t cap = view.len / 2 + 4;
    int32_t *out = (int32_t *)PyMem_Malloc((size_t)cap * sizeof(int32_t));
    if (!out) {
        PyBuffer_Release(&view);
        return PyErr_NoMemory();
    }

    Py_ssize_t n = 0;
    while (p < end) {
        /* skip whitespace separators ONLY; any other non-digit byte (letters,
         * ':', '.', ...) means this is not a pure-integer triplet file —
         * raise instead of silently stripping it (e.g. 'GO:0005737' must not
         * silently become 5737). */
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
            p++;
        if (p >= end)
            break;
        int neg = 0;
        if (*p == '-') {
            neg = 1;
            p++;
        }
        int64_t v = 0;
        int digits = 0;
        while (p < end && *p >= '0' && *p <= '9') {
            v = v * 10 + (*p - '0');
            p++;
            digits++;
            /* int32 overflow; the negative branch admits INT32_MIN */
            if (digits > 10 || v > (int64_t)INT32_MAX + (neg ? 1 : 0)) {
                PyMem_Free(out);
                PyBuffer_Release(&view);
                PyErr_Format(PyExc_ValueError,
                             "triplet id exceeds int32 range near byte offset %zd",
                             (Py_ssize_t)(p - (const char *)view.buf));
                return NULL;
            }
        }
        if (!digits || (p < end && *p != ' ' && *p != '\t' && *p != '\n' &&
                        *p != '\r')) {
            PyMem_Free(out);
            PyBuffer_Release(&view);
            PyErr_Format(PyExc_ValueError,
                         "unexpected byte 0x%02x at offset %zd: triplet files "
                         "must contain only whitespace-separated integers "
                         "(string ids take the vocabulary path)",
                         (unsigned char)(p < end ? *p : '-'),
                         (Py_ssize_t)(p - (const char *)view.buf));
            return NULL;
        }
        out[n++] = (int32_t)(neg ? -v : v);
    }

    if (n % 3 != 0) {
        PyMem_Free(out);
        PyBuffer_Release(&view);
        PyErr_Format(PyExc_ValueError,
                     "triplet file token count %zd is not a multiple of 3", n);
        return NULL;
    }

    PyObject *result = PyBytes_FromStringAndSize((const char *)out,
                                                 n * (Py_ssize_t)sizeof(int32_t));
    PyMem_Free(out);
    PyBuffer_Release(&view);
    return result;
}

static inline uint64_t
xorshift128plus(uint64_t *s)
{
    uint64_t x = s[0];
    const uint64_t y = s[1];
    s[0] = y;
    x ^= x << 23;
    s[1] = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s[1] + y;
}

static PyObject *
sample_negatives(PyObject *self, PyObject *args)
{
    Py_ssize_t n;
    long long num_entities;
    unsigned long long seed;
    if (!PyArg_ParseTuple(args, "nLK", &n, &num_entities, &seed))
        return NULL;
    if (n < 0 || num_entities <= 0) {
        PyErr_SetString(PyExc_ValueError, "n must be >=0 and num_entities > 0");
        return NULL;
    }

    PyObject *result = PyBytes_FromStringAndSize(NULL, n * (Py_ssize_t)sizeof(int32_t));
    if (!result)
        return NULL;
    int32_t *out = (int32_t *)PyBytes_AS_STRING(result);

    /* splitmix64 seeding so nearby seeds give unrelated streams */
    uint64_t z = seed + 0x9E3779B97F4A7C15ULL;
    uint64_t s[2];
    for (int i = 0; i < 2; i++) {
        z += 0x9E3779B97F4A7C15ULL;
        uint64_t t = z;
        t = (t ^ (t >> 30)) * 0xBF58476D1CE4E5B9ULL;
        t = (t ^ (t >> 27)) * 0x94D049BB133111EBULL;
        s[i] = t ^ (t >> 31);
    }

    for (Py_ssize_t i = 0; i < n; i++)
        out[i] = (int32_t)(xorshift128plus(s) % (uint64_t)num_entities);

    return result;
}

static PyMethodDef Methods[] = {
    {"parse_triplets", parse_triplets, METH_VARARGS,
     "parse_triplets(data: bytes) -> bytes of packed int32 triplets"},
    {"sample_negatives", sample_negatives, METH_VARARGS,
     "sample_negatives(n, num_entities, seed) -> bytes of packed int32 ids"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "probgan_native",
    "Native runtime components for probgan_tpu", -1, Methods,
};

PyMODINIT_FUNC
PyInit_probgan_native(void)
{
    return PyModule_Create(&moduledef);
}

// Host-side varlen batch packing — native C++ companion to
// sageattention_tpu/varlen.py.
//
// The reference's native layer is device-side CUDA (csrc/fused, csrc/qattn);
// on TPU those become Pallas kernels.  What remains host-side in a TPU
// serving stack is the ragged-batch bookkeeping that runs per request batch
// on the CPU data path: cumulative-length tables, token->segment ids, and
// pack/unpack index maps.  Implemented here against the CPython/NumPy C API
// (no pybind11 in this image) and loaded lazily by
// sageattention_tpu/native.py with a pure-python fallback.
//
// Exposed functions (all int32 / int64 numpy arrays):
//   cu_seqlens(lengths[n])              -> [n+1] exclusive prefix sum
//   segment_ids(cu[n+1], total_padded)  -> [total_padded] ids, pad = -1
//   pack_indices(lengths[n], max_len)   -> gather map [n*max_len] from the
//       padded [n, max_len] layout into the packed [total] buffer and back:
//       returns (packed_to_padded[total], padded_valid_mask[n*max_len])

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <vector>

namespace {

PyArrayObject* as_int32_vec(PyObject* obj, const char* name) {
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(obj, NPY_INT32, NPY_ARRAY_IN_ARRAY));
  if (!arr) return nullptr;
  if (PyArray_NDIM(arr) != 1) {
    PyErr_Format(PyExc_ValueError, "%s must be 1-D", name);
    Py_DECREF(arr);
    return nullptr;
  }
  return arr;
}

PyObject* cu_seqlens(PyObject*, PyObject* args) {
  PyObject* lengths_obj;
  if (!PyArg_ParseTuple(args, "O", &lengths_obj)) return nullptr;
  PyArrayObject* lengths = as_int32_vec(lengths_obj, "lengths");
  if (!lengths) return nullptr;

  npy_intp n = PyArray_DIM(lengths, 0);
  npy_intp out_dim = n + 1;
  PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(1, &out_dim, NPY_INT32));
  if (!out) { Py_DECREF(lengths); return nullptr; }

  const int32_t* lp = static_cast<int32_t*>(PyArray_DATA(lengths));
  int32_t* op = static_cast<int32_t*>(PyArray_DATA(out));
  int64_t acc = 0;
  op[0] = 0;
  for (npy_intp i = 0; i < n; ++i) {
    if (lp[i] < 0) {
      PyErr_SetString(PyExc_ValueError, "negative sequence length");
      Py_DECREF(lengths); Py_DECREF(out);
      return nullptr;
    }
    acc += lp[i];
    if (acc > INT32_MAX) {
      PyErr_SetString(PyExc_OverflowError, "total tokens exceed int32");
      Py_DECREF(lengths); Py_DECREF(out);
      return nullptr;
    }
    op[i + 1] = static_cast<int32_t>(acc);
  }
  Py_DECREF(lengths);
  return reinterpret_cast<PyObject*>(out);
}

PyObject* segment_ids(PyObject*, PyObject* args) {
  PyObject* cu_obj;
  long total_padded;
  if (!PyArg_ParseTuple(args, "Ol", &cu_obj, &total_padded)) return nullptr;
  PyArrayObject* cu = as_int32_vec(cu_obj, "cu_seqlens");
  if (!cu) return nullptr;

  npy_intp ncu = PyArray_DIM(cu, 0);
  const int32_t* cp = static_cast<int32_t*>(PyArray_DATA(cu));
  npy_intp out_dim = total_padded;
  PyArrayObject* out = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(1, &out_dim, NPY_INT32));
  if (!out) { Py_DECREF(cu); return nullptr; }
  int32_t* op = static_cast<int32_t*>(PyArray_DATA(out));

  // single linear sweep: token t belongs to segment s while t < cu[s+1]
  npy_intp s = 0;
  int32_t total = ncu > 0 ? cp[ncu - 1] : 0;
  for (long t = 0; t < total_padded; ++t) {
    if (t >= total) { op[t] = -1; continue; }        // padding tokens
    while (s + 1 < ncu - 1 && t >= cp[s + 1]) ++s;   // advance segment
    while (s + 1 < ncu - 1 && cp[s] == cp[s + 1]) ++s;  // skip empty seqs
    op[t] = static_cast<int32_t>(s);
  }
  Py_DECREF(cu);
  return reinterpret_cast<PyObject*>(out);
}

PyObject* pack_indices(PyObject*, PyObject* args) {
  PyObject* lengths_obj;
  long max_len;
  if (!PyArg_ParseTuple(args, "Ol", &lengths_obj, &max_len)) return nullptr;
  PyArrayObject* lengths = as_int32_vec(lengths_obj, "lengths");
  if (!lengths) return nullptr;

  npy_intp n = PyArray_DIM(lengths, 0);
  const int32_t* lp = static_cast<int32_t*>(PyArray_DATA(lengths));
  int64_t total = 0;
  for (npy_intp i = 0; i < n; ++i) total += lp[i];

  npy_intp tot_dim = total;
  npy_intp pad_dim = n * max_len;
  PyArrayObject* gather = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(1, &tot_dim, NPY_INT64));
  PyArrayObject* mask = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(1, &pad_dim, NPY_BOOL));
  if (!gather || !mask) {
    Py_XDECREF(gather); Py_XDECREF(mask); Py_DECREF(lengths);
    return nullptr;
  }
  int64_t* gp = static_cast<int64_t*>(PyArray_DATA(gather));
  npy_bool* mp = static_cast<npy_bool*>(PyArray_DATA(mask));

  int64_t w = 0;
  for (npy_intp i = 0; i < n; ++i) {
    const int32_t len = lp[i];
    if (len > max_len) {
      PyErr_Format(PyExc_ValueError, "length %d > max_len %ld", len, max_len);
      Py_DECREF(gather); Py_DECREF(mask); Py_DECREF(lengths);
      return nullptr;
    }
    for (long t = 0; t < max_len; ++t) {
      const bool valid = t < len;
      mp[i * max_len + t] = valid;
      if (valid) gp[w++] = i * max_len + t;
    }
  }
  Py_DECREF(lengths);
  PyObject* tuple = PyTuple_Pack(2, reinterpret_cast<PyObject*>(gather),
                                 reinterpret_cast<PyObject*>(mask));
  Py_DECREF(gather);
  Py_DECREF(mask);
  return tuple;
}

PyMethodDef kMethods[] = {
    {"cu_seqlens", cu_seqlens, METH_VARARGS,
     "lengths[int32] -> cumulative sequence-length table [n+1]"},
    {"segment_ids", segment_ids, METH_VARARGS,
     "(cu_seqlens[int32], total_padded) -> per-token segment ids (pad=-1)"},
    {"pack_indices", pack_indices, METH_VARARGS,
     "(lengths[int32], max_len) -> (gather_map[int64], valid_mask[bool])"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_sageattn_native",
    "Host-side varlen packing (C++)", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__sageattn_native(void) {
  import_array();
  return PyModule_Create(&kModule);
}

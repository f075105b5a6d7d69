// C ABI for pcodec_tpu — the pco_c equivalent.
//
// Mirrors the reference's caller-allocates C surface
// (ref: pco_c/src/lib.rs:128-195, pco_c/include/cpcodec_generated.h):
//   pco_standalone_guarantee_file_size
//   pco_standalone_simple_compress_into
//   pco_standalone_simple_decompress_into
// plus init/teardown. The reference's pco_c is a thin wrapper over the Rust
// core; this is the same thin wrapper over the pcodec_tpu runtime via an
// embedded CPython interpreter (the codec core is Python/JAX/C++-kernels).
//
// Build: g++ -O2 -shared -fPIC cpcodec.cpp $(python3-config --includes) \
//            $(python3-config --ldflags --embed) -o libcpcodec.so
// Header: cpcodec.h. Test: test_cpcodec.c.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <mutex>

#include "cpcodec.h"

static std::once_flag g_init_once;
static PyObject* g_mod = nullptr;  // pcodec_tpu.capi

static void ensure_init() {
  std::call_once(g_init_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
    }
    PyGILState_STATE gil = PyGILState_Ensure();
    g_mod = PyImport_ImportModule("pcodec_tpu.capi");
    if (!g_mod) {
      PyErr_Print();
    }
    PyGILState_Release(gil);
  });
}

extern "C" {

int pco_init(void) {
  ensure_init();
  return g_mod ? PCO_SUCCESS : PCO_INVALID_ARGUMENT;
}

size_t pco_standalone_guarantee_file_size(unsigned char number_type_byte,
                                          size_t n) {
  ensure_init();
  if (!g_mod) return 0;
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* r = PyObject_CallMethod(g_mod, "guarantee_file_size", "bn",
                                    number_type_byte, (Py_ssize_t)n);
  size_t out = 0;
  if (r) {
    out = (size_t)PyLong_AsSize_t(r);
    Py_DECREF(r);
  } else {
    PyErr_Print();
  }
  PyGILState_Release(gil);
  return out;
}

int pco_standalone_simple_compress_into(
    const void* src, size_t n, unsigned char number_type_byte,
    unsigned int compression_level, unsigned char* dst, size_t dst_capacity,
    size_t* dst_written) {
  ensure_init();
  if (!g_mod || !src || !dst || !dst_written) return PCO_INVALID_ARGUMENT;
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* r2 = PyObject_CallMethod(
      g_mod, "simple_compress_ptr", "KnbI", (unsigned long long)(uintptr_t)src,
      (Py_ssize_t)n, number_type_byte, compression_level);
  int code = PCO_INVALID_ARGUMENT;
  if (r2 && PyBytes_Check(r2)) {
    size_t len = (size_t)PyBytes_GET_SIZE(r2);
    if (len <= dst_capacity) {
      std::memcpy(dst, PyBytes_AS_STRING(r2), len);
      *dst_written = len;
      code = PCO_SUCCESS;
    } else {
      code = PCO_INSUFFICIENT_DATA;
    }
  } else if (!r2) {
    PyErr_Print();
    code = PCO_COMPRESSION_ERROR;
  }
  Py_XDECREF(r2);
  PyGILState_Release(gil);
  return code;
}

int pco_standalone_simple_decompress_into(
    const unsigned char* src, size_t src_len, unsigned char number_type_byte,
    void* dst, size_t dst_capacity_elems, size_t* n_written) {
  ensure_init();
  if (!g_mod || !src || !dst || !n_written) return PCO_INVALID_ARGUMENT;
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* r = PyObject_CallMethod(
      g_mod, "simple_decompress_ptr", "y#bKn", (const char*)src,
      (Py_ssize_t)src_len, number_type_byte,
      (unsigned long long)(uintptr_t)dst, (Py_ssize_t)dst_capacity_elems);
  int code = PCO_INVALID_ARGUMENT;
  if (r && PyLong_Check(r)) {
    long long wrote = PyLong_AsLongLong(r);
    if (wrote >= 0) {
      *n_written = (size_t)wrote;
      code = PCO_SUCCESS;
    } else {
      code = (int)-wrote;  // negative python result encodes the error code
    }
  } else if (!r) {
    PyErr_Print();
    code = PCO_DECOMPRESSION_ERROR;
  }
  Py_XDECREF(r);
  PyGILState_Release(gil);
  return code;
}

}  // extern "C"

/* C ABI implementation (include/raisr_tpu.h) — embeds CPython and drives
 * raisr_tpu.capi_bridge. Build: see native/CMakeLists.txt (produces
 * libraisr_tpu.so for C/C++ consumers, e.g. an FFmpeg filter).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <dlfcn.h>
#include <sys/stat.h>

#include <cstdio>
#include <cstdlib>
#include <mutex>
#include <string>

#include "../../include/raisr_tpu.h"

namespace {

std::mutex g_mutex;
bool g_we_initialized_python = false;
PyObject* g_bridge = nullptr;
int g_device = -1;  // RTPU_SetDevice selection, applied at Init

// Make the raisr_tpu package importable regardless of how the host process
// was launched: try $RAISR_TPU_PYTHONPATH and the source tree the shared
// library was built from (build/capi/libraisr_tpu.so -> repo root).
// Prepend a directory to sys.path if it contains a raisr_tpu/ package.
// Uses the C API directly (no generated source: a path containing quotes
// or backslashes must not be able to alter injected code).
void sys_path_prepend_if_package(const std::string& dir) {
  if (dir.empty()) return;
  struct stat st;
  if (stat((dir + "/raisr_tpu").c_str(), &st) != 0 || !S_ISDIR(st.st_mode))
    return;
  PyObject* path = PySys_GetObject("path");  // borrowed
  if (!path) return;
  PyObject* entry = PyUnicode_DecodeFSDefault(dir.c_str());
  if (!entry) {
    PyErr_Clear();
    return;
  }
  int present = PySequence_Contains(path, entry);
  if (present == 0) PyList_Insert(path, 0, entry);
  if (present < 0) PyErr_Clear();
  Py_DECREF(entry);
}

// Explicit opt-ins only: RAISR_TPU_PYTHONPATH and the install tree the
// shared library itself lives in (dladdr). The host process's cwd is
// deliberately NOT consulted — an embedding host (e.g. a media player)
// run inside an untrusted directory must not import a planted
// raisr_tpu/__init__.py from there.
void extend_sys_path() {
  const char* env = getenv("RAISR_TPU_PYTHONPATH");
  if (env) sys_path_prepend_if_package(env);
  Dl_info info;
  if (dladdr(reinterpret_cast<void*>(&extend_sys_path), &info) &&
      info.dli_fname) {
    std::string libdir(info.dli_fname);
    size_t slash = libdir.rfind('/');
    if (slash != std::string::npos) {
      libdir.resize(slash);
      sys_path_prepend_if_package(libdir + "/../..");
      sys_path_prepend_if_package(libdir);
    }
  }
}

bool ensure_python() {
  if (!Py_IsInitialized()) {
    Py_Initialize();
    g_we_initialized_python = true;
  }
  if (!g_bridge) {
    extend_sys_path();
    g_bridge = PyImport_ImportModule("raisr_tpu.capi_bridge");
    if (!g_bridge) {
      PyErr_Print();
      return false;
    }
  }
  return true;
}

PyObject* plane_tuple(const RTPUPlane* p) {
  if (!p || !p->data) Py_RETURN_NONE;
  return Py_BuildValue("(KIII)", (unsigned long long)(uintptr_t)p->data,
                       p->width, p->height, p->step);
}

RTPUStatus call_int(PyObject* result) {
  if (!result) {
    PyErr_Print();
    return RTPU_ERROR_UNDEFINED;
  }
  long rc = PyLong_AsLong(result);
  Py_DECREF(result);
  return rc == 0 ? RTPU_OK : RTPU_ERROR_BAD_PARAMETER;
}

}  // namespace

extern "C" {

RTPUStatus RTPU_InitEx(const char* model_path, float ratio,
                       unsigned int bit_depth, RTPURangeType range,
                       unsigned int passes, unsigned int two_pass_mode,
                       RTPUTier tier) {
  std::lock_guard<std::mutex> lock(g_mutex);
  if (!ensure_python()) return RTPU_ERROR_UNDEFINED;
  PyGILState_STATE gil = PyGILState_Ensure();
  if (g_device >= 0) {
    PyObject* d =
        PyObject_CallMethod(g_bridge, "set_device", "i", g_device);
    RTPUStatus ds = call_int(d);
    if (ds != RTPU_OK) {
      PyGILState_Release(gil);
      return ds;
    }
  }
  PyObject* r = PyObject_CallMethod(g_bridge, "init", "sfiiiii", model_path,
                                    (double)ratio, (int)bit_depth, (int)range,
                                    (int)passes, (int)two_pass_mode,
                                    (int)tier);
  RTPUStatus status = call_int(r);
  PyGILState_Release(gil);
  return status;
}

RTPUStatus RTPU_SetDevice(int device_index) {
  /* Stored and applied at Init: the embedded interpreter (and JAX's device
   * enumeration) may not exist yet when the host calls this. */
  std::lock_guard<std::mutex> lock(g_mutex);
  if (device_index < 0) return RTPU_ERROR_BAD_PARAMETER;
  g_device = device_index;
  return RTPU_OK;
}

RTPUStatus RTPU_Init(const char* model_path, float ratio,
                     unsigned int bit_depth, RTPURangeType range,
                     unsigned int passes, unsigned int two_pass_mode) {
  return RTPU_InitEx(model_path, ratio, bit_depth, range, passes,
                     two_pass_mode, RTPU_TIER_F32);
}

RTPUStatus RTPU_SetRes(const RTPUPlane*, const RTPUPlane*, const RTPUPlane*,
                       const RTPUPlane*, const RTPUPlane*, const RTPUPlane*) {
  /* Geometry is captured by jit specialization on first Process; kept for
   * call-sequence compatibility with the reference lifecycle. */
  return RTPU_OK;
}

RTPUStatus RTPU_Process(const RTPUPlane* in_y, const RTPUPlane* in_cb,
                        const RTPUPlane* in_cr, RTPUPlane* out_y,
                        RTPUPlane* out_cb, RTPUPlane* out_cr,
                        RTPUBlendingMode blending) {
  std::lock_guard<std::mutex> lock(g_mutex);
  if (!g_bridge) return RTPU_ERROR_BAD_PARAMETER;
  PyGILState_STATE gil = PyGILState_Ensure();
  PyObject* args = Py_BuildValue(
      "(NNNNNNi)", plane_tuple(in_y), plane_tuple(in_cb), plane_tuple(in_cr),
      plane_tuple(out_y), plane_tuple(out_cb), plane_tuple(out_cr),
      (int)blending);
  PyObject* fn = PyObject_GetAttrString(g_bridge, "process");
  PyObject* r = fn && args ? PyObject_CallObject(fn, args) : nullptr;
  Py_XDECREF(fn);
  Py_XDECREF(args);
  RTPUStatus status = call_int(r);
  PyGILState_Release(gil);
  return status;
}

const char* RTPU_Version(void) {
#define RTPU_STR_(x) #x
#define RTPU_STR(x) RTPU_STR_(x)
  return RTPU_STR(RAISR_TPU_VERSION_MAJOR) "." RTPU_STR(
      RAISR_TPU_VERSION_MINOR) "." RTPU_STR(RAISR_TPU_VERSION_PATCH);
#undef RTPU_STR
#undef RTPU_STR_
}

RTPUStatus RTPU_Deinit(void) {
  std::lock_guard<std::mutex> lock(g_mutex);
  if (g_bridge) {
    PyGILState_STATE gil = PyGILState_Ensure();
    PyObject* r = PyObject_CallMethod(g_bridge, "deinit", nullptr);
    Py_XDECREF(r);
    Py_DECREF(g_bridge);
    g_bridge = nullptr;
    PyGILState_Release(gil);
  }
  return RTPU_OK;
}

}  /* extern "C" */

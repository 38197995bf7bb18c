// Process-wide hugepage-backed numpy data allocator.
//
// Round-3 root cause (docs/DESIGN.md §2e): on the build VMs,
// anonymous-memory first-touch faults cost ~1 us/4 KiB page in a small
// process but ~27 us/page once RSS exceeds a few GB — so every fresh
// multi-hundred-MB numpy allocation in a long-lived process (reorder
// permutes, from_coo sorts, synthetic generators) pays a 10-30 s fault
// wall that depends on process history.  utils/alloc.py::zeros_hugepage
// fixed the two buffers the builder knew about; the round-3 driver run
// still recorded order_s 26 s because the ORDER stage's allocations go
// through numpy's own allocator (VERDICT round-3 #1).
//
// This extension fixes the problem at the allocator level: it installs a
// NumPy data-memory handler (PyDataMem_SetHandler, numpy >= 1.22) that
// backs every allocation >= SGC_TPU_HUGEALLOC_MIN_MB (default 64 MB)
// with an anonymous mmap + madvise(MADV_HUGEPAGE).  THP is madvise-mode
// on standard kernels, so plain malloc/np.zeros never gets 2 MiB pages;
// with the hint the fault count drops 512x and a fresh 2.7 GB buffer
// faults in ~1.5 s instead of ~30 s regardless of prior RSS.  Small
// allocations delegate to the system malloc unchanged.
//
// Every block (huge or small) carries a 64-byte header holding a magic
// tag and the total mapping size, so free/realloc route to the correct
// deallocator without global bookkeeping; NumPy tracks the handler
// per-array, so blocks from the previous handler never reach us.
//
// The reference has no analog (its host prep is scipy on small graphs,
// reference normalization.py:5-28); this is TPU-build host-runtime
// infrastructure per SURVEY §2.4 ("C++ host tool ... where Python would
// be too slow").

#define _GNU_SOURCE 1
#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>

#include <sys/mman.h>
#include <cerrno>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>

#ifndef MADV_HUGEPAGE
#define MADV_HUGEPAGE 14
#endif

namespace {

constexpr size_t kHdr = 64;  // cache-line header; preserves >=16B alignment
constexpr uint64_t kHugeMagic = 0x53474348554745ULL;   // "SGCHUGE"
constexpr uint64_t kSmallMagic = 0x534743534d4cULL;    // "SGCSML"

struct BlockHeader {
  uint64_t magic;
  size_t total;  // full mapping / malloc size, header included
};

static_assert(sizeof(BlockHeader) <= kHdr, "header must fit in 64 bytes");

size_t g_huge_min = size_t(64) << 20;
// crude counters surfaced via stats() so tests/bench can prove the
// handler actually served the big allocations
size_t g_huge_live = 0, g_huge_total_allocs = 0;

BlockHeader* header_of(void* data) {
  return reinterpret_cast<BlockHeader*>(static_cast<char*>(data) - kHdr);
}

void* huge_alloc(size_t size) {
  size_t total = size + kHdr;
  void* base = mmap(nullptr, total, PROT_READ | PROT_WRITE,
                    MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
  if (base == MAP_FAILED) return nullptr;
  madvise(base, total, MADV_HUGEPAGE);
  auto* hdr = static_cast<BlockHeader*>(base);
  hdr->magic = kHugeMagic;
  hdr->total = total;
  g_huge_live++;
  g_huge_total_allocs++;
  return static_cast<char*>(base) + kHdr;
}

void* small_alloc(size_t size, bool zero) {
  size_t total = size + kHdr;
  void* base = zero ? calloc(1, total) : malloc(total);
  if (base == nullptr) return nullptr;
  auto* hdr = static_cast<BlockHeader*>(base);
  hdr->magic = kSmallMagic;
  hdr->total = total;
  return static_cast<char*>(base) + kHdr;
}

void* hp_malloc(void*, size_t size) {
  if (size == 0) size = 1;
  if (size >= g_huge_min) {
    void* p = huge_alloc(size);
    if (p != nullptr) return p;  // else fall through to malloc
  }
  return small_alloc(size, false);
}

void* hp_calloc(void*, size_t nelem, size_t elsize) {
  if (elsize != 0 && nelem > SIZE_MAX / elsize) return nullptr;
  size_t size = nelem * elsize;
  if (size == 0) size = 1;
  if (size >= g_huge_min) {
    void* p = huge_alloc(size);  // anonymous mmap is already zeroed
    if (p != nullptr) return p;
  }
  return small_alloc(size, true);
}

void hp_free(void*, void* ptr, size_t /*size*/) {
  if (ptr == nullptr) return;
  BlockHeader* hdr = header_of(ptr);
  if (hdr->magic == kHugeMagic) {
    g_huge_live--;
    munmap(hdr, hdr->total);
  } else if (hdr->magic == kSmallMagic) {
    free(hdr);
  } else {
    // foreign pointer: NumPy tracks handlers per array, so this should
    // be unreachable — leak loudly rather than corrupt the heap.
    fprintf(stderr,
            "sgc_tpu hugealloc: free() of unrecognized block %p — leaking\n",
            ptr);
  }
}

void* hp_realloc(void*, void* ptr, size_t new_size) {
  if (ptr == nullptr) return hp_malloc(nullptr, new_size);
  if (new_size == 0) new_size = 1;
  BlockHeader* hdr = header_of(ptr);
  size_t old_total = hdr->total;
  size_t old_data = old_total - kHdr;
  bool old_huge = hdr->magic == kHugeMagic;
  bool new_huge = new_size >= g_huge_min;

  if (old_huge && new_huge) {
    size_t new_total = new_size + kHdr;
    void* base = mremap(hdr, old_total, new_total, MREMAP_MAYMOVE);
    if (base == MAP_FAILED) return nullptr;
    madvise(base, new_total, MADV_HUGEPAGE);
    auto* nh = static_cast<BlockHeader*>(base);
    nh->magic = kHugeMagic;
    nh->total = new_total;
    return static_cast<char*>(base) + kHdr;
  }
  if (!old_huge && !new_huge) {
    void* base = realloc(hdr, new_size + kHdr);
    if (base == nullptr) return nullptr;
    auto* nh = static_cast<BlockHeader*>(base);
    nh->total = new_size + kHdr;
    return static_cast<char*>(base) + kHdr;
  }
  // crossing the threshold: allocate fresh on the new side, copy, free
  void* fresh = new_huge ? huge_alloc(new_size) : small_alloc(new_size, false);
  if (fresh == nullptr && new_huge) fresh = small_alloc(new_size, false);
  if (fresh == nullptr) return nullptr;
  memcpy(fresh, ptr, old_data < new_size ? old_data : new_size);
  hp_free(nullptr, ptr, old_data);
  return fresh;
}

PyDataMem_Handler g_handler = {
    "sgc_tpu_hugepage_allocator",
    1,
    {
        nullptr,   // ctx
        hp_malloc,
        hp_calloc,
        hp_realloc,
        hp_free,
    },
};

PyObject* g_prev_handler = nullptr;  // capsule returned by SetHandler

PyObject* py_install(PyObject*, PyObject*) {
  if (g_prev_handler != nullptr) {  // already installed
    Py_RETURN_FALSE;
  }
  PyObject* capsule =
      PyCapsule_New(&g_handler, "mem_handler", nullptr);
  if (capsule == nullptr) return nullptr;
  PyObject* prev = PyDataMem_SetHandler(capsule);
  Py_DECREF(capsule);
  if (prev == nullptr) return nullptr;
  g_prev_handler = prev;
  Py_RETURN_TRUE;
}

PyObject* py_uninstall(PyObject*, PyObject*) {
  if (g_prev_handler == nullptr) Py_RETURN_FALSE;
  PyObject* cur = PyDataMem_SetHandler(g_prev_handler);
  Py_XDECREF(cur);
  Py_DECREF(g_prev_handler);
  g_prev_handler = nullptr;
  Py_RETURN_TRUE;
}

PyObject* py_installed(PyObject*, PyObject*) {
  return PyBool_FromLong(g_prev_handler != nullptr);
}

PyObject* py_stats(PyObject*, PyObject*) {
  return Py_BuildValue(
      "{s:n, s:n, s:n}", "huge_live", Py_ssize_t(g_huge_live),
      "huge_total_allocs", Py_ssize_t(g_huge_total_allocs),
      "threshold_bytes", Py_ssize_t(g_huge_min));
}

PyMethodDef methods[] = {
    {"install", py_install, METH_NOARGS,
     "Install the hugepage handler for all future numpy allocations."},
    {"uninstall", py_uninstall, METH_NOARGS,
     "Restore the previously active numpy allocator."},
    {"installed", py_installed, METH_NOARGS, "Is the handler active?"},
    {"stats", py_stats, METH_NOARGS, "Allocation counters."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_hugealloc",
    "NumPy data-memory handler backing large allocations with "
    "MADV_HUGEPAGE anonymous mmaps.",
    -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__hugealloc(void) {
  import_array();
  const char* env = getenv("SGC_TPU_HUGEALLOC_MIN_MB");
  if (env != nullptr) {
    char* end = nullptr;
    double mb = strtod(env, &end);
    if (end != env && mb > 0) g_huge_min = size_t(mb * (1 << 20));
  }
  return PyModule_Create(&moduledef);
}

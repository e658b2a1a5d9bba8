// Host-side serving runtime: page-pool allocator + radix prefix cache.
//
// The TPU side of the serving stack (paged int8 KV pools, block-table DMA
// scheduling) lives in Pallas (`sageattention_tpu/ops/paged_decode.py`);
// this is the CPU side a continuous-batching server runs between jitted
// steps, kept native because it sits on the request hot path (admission /
// eviction decisions at every step, thousands of sequences, microsecond
// budgets — the role vLLM's C++ block manager plays; the reference
// project itself is kernel-only and has no serving runtime).
//
//   PagePool    O(1) refcounted free-list allocator over physical pages.
//   RadixCache  automatic prefix caching: a trie over page-sized token
//               blocks mapping prompt prefixes to already-quantized pages
//               (refcounted, LRU-evictable).  Admission walks the trie to
//               find the longest cached prefix, so a shared system prompt
//               is quantized ONCE and every later request's prefill skips
//               those tokens entirely.
//
// Exposed via the CPython C API as `_sageattn_serving` (no pybind11 in
// this environment); `sageattention_tpu/serving.py` holds the pure-python
// fallback with identical semantics.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------- PagePool

struct PagePool {
  static constexpr int32_t kRunGrain = 4;  // == paged._RUNS_GRAIN
  std::vector<int32_t> free_list;          // free pages
  std::vector<int32_t> refs;               // per-page refcount
  explicit PagePool(int32_t num_pages) : refs(num_pages, 0) {
    free_list.reserve(num_pages);
    for (int32_t p = num_pages - 1; p >= 0; --p) free_list.push_back(p);
  }
  int64_t free_pages() const { return (int64_t)free_list.size(); }
  // Reserve n pages; returns false (and takes nothing) if short.
  // Run-aware (r5): kRunGrain-aligned consecutive groups first, remainder
  // ascending — the paged-decode kernel fetches aligned runs as single
  // DMA blocks, so keep run coverage high across pool churn.
  bool reserve(int32_t n, std::vector<int32_t>* out) {
    if (n > (int32_t)free_list.size()) return false;
    std::sort(free_list.begin(), free_list.end());
    std::vector<char> is_free(refs.size(), 0);
    for (int32_t p : free_list) is_free[p] = 1;
    std::vector<int32_t> take;
    take.reserve(n);
    if (n >= kRunGrain) {
      for (int32_t p : free_list) {
        if ((int32_t)take.size() + kRunGrain > n) break;
        if (p % kRunGrain != 0) continue;
        bool run = true;
        for (int32_t i = 0; i < kRunGrain; ++i) {
          if (p + i >= (int32_t)refs.size() || !is_free[p + i]) {
            run = false;
            break;
          }
        }
        if (run) {
          for (int32_t i = 0; i < kRunGrain; ++i) {
            take.push_back(p + i);
            is_free[p + i] = 0;
          }
        }
      }
    }
    for (int32_t p : free_list) {
      if ((int32_t)take.size() >= n) break;
      if (is_free[p]) {
        take.push_back(p);
        is_free[p] = 0;
      }
    }
    std::vector<int32_t> remaining;
    remaining.reserve(free_list.size() - n);
    for (int32_t p : free_list)
      if (is_free[p]) remaining.push_back(p);
    free_list.swap(remaining);
    out->reserve(out->size() + n);
    for (int32_t p : take) {
      refs[p] = 1;
      out->push_back(p);
    }
    return true;
  }
  void share(const int32_t* pages, Py_ssize_t n) {
    for (Py_ssize_t i = 0; i < n; ++i) refs[pages[i]] += 1;
  }
  // Returns -1 on double-release, else 0.
  int release(const int32_t* pages, Py_ssize_t n) {
    for (Py_ssize_t i = 0; i < n; ++i) {
      int32_t p = pages[i];
      if (refs[p] <= 0) return -1;
      if (--refs[p] == 0) free_list.push_back(p);
    }
    return 0;
  }
};

// --------------------------------------------------------------- RadixCache
//
// Trie over PAGE-SIZED token blocks.  Each node = one fully-filled page
// whose content is identified by (parent, hash(block tokens)); collisions
// are resolved by comparing the stored tokens.  A node holds the physical
// page id of the quantized KV data and an LRU stamp; `match` walks the
// longest cached prefix, `insert` adds newly quantized pages, `evict`
// frees least-recently-used LEAVES (interior nodes are prefixes of live
// entries and must outlive them).

struct RadixNode {
  std::vector<int32_t> tokens;             // the page's token block
  int32_t page = -1;                       // physical page id
  int32_t parent = 0;                      // node index (0 = root)
  uint64_t lru = 0;
  int32_t children = 0;                    // child count (eviction gate)
  bool live = true;                        // false after eviction
};

static inline uint64_t hash_block(int32_t parent, const int32_t* t,
                                  Py_ssize_t n) {
  uint64_t h = 1469598103934665603ull ^ (uint64_t)parent;
  for (Py_ssize_t i = 0; i < n; ++i) {
    h ^= (uint64_t)(uint32_t)t[i];
    h *= 1099511628211ull;
  }
  return h;
}

struct RadixCache {
  int32_t page_size;
  uint64_t clock = 0;
  std::vector<RadixNode> nodes;            // [0] is the root sentinel
  std::unordered_multimap<uint64_t, int32_t> index;  // hash -> node id
  explicit RadixCache(int32_t ps) : page_size(ps) { nodes.emplace_back(); }

  int32_t find_child(int32_t parent, const int32_t* blk) const {
    uint64_t h = hash_block(parent, blk, page_size);
    auto range = index.equal_range(h);
    for (auto it = range.first; it != range.second; ++it) {
      const RadixNode& n = nodes[it->second];
      if (!n.live || n.parent != parent) continue;
      if (std::equal(n.tokens.begin(), n.tokens.end(), blk)) return it->second;
    }
    return -1;
  }

  // Longest cached prefix: appends matched page ids, returns matched count.
  int64_t match(const int32_t* tokens, Py_ssize_t n_tokens,
                std::vector<int32_t>* pages) {
    int32_t cur = 0;
    int64_t matched = 0;
    clock++;
    for (Py_ssize_t off = 0; off + page_size <= n_tokens; off += page_size) {
      int32_t child = find_child(cur, tokens + off);
      if (child < 0) break;
      nodes[child].lru = clock;
      pages->push_back(nodes[child].page);
      cur = child;
      matched++;
    }
    return matched;
  }

  // Insert full blocks [start_block, ...) under the existing prefix chain;
  // caller guarantees blocks < start_block are already present.
  void insert(const int32_t* tokens, Py_ssize_t n_tokens,
              const int32_t* pages, int64_t start_block) {
    int32_t cur = 0;
    int64_t blk_i = 0;
    clock++;
    for (Py_ssize_t off = 0; off + page_size <= n_tokens;
         off += page_size, ++blk_i) {
      if (blk_i < start_block) {
        int32_t child = find_child(cur, tokens + off);
        if (child < 0) return;  // prefix chain broken (evicted) — stop
        nodes[child].lru = clock;
        cur = child;
        continue;
      }
      int32_t child = find_child(cur, tokens + off);
      if (child >= 0) { nodes[child].lru = clock; cur = child; continue; }
      RadixNode node;
      node.tokens.assign(tokens + off, tokens + off + page_size);
      node.page = pages[blk_i];
      node.parent = cur;
      node.lru = clock;
      nodes.push_back(std::move(node));
      int32_t id = (int32_t)nodes.size() - 1;
      index.emplace(hash_block(cur, tokens + off, page_size), id);
      nodes[cur].children += 1;
      cur = id;
    }
  }

  // Evict up to n least-recently-used leaves; appends freed page ids.
  int64_t evict(int64_t n, std::vector<int32_t>* freed) {
    int64_t done = 0;
    while (done < n) {
      int32_t best = -1;
      for (int32_t i = 1; i < (int32_t)nodes.size(); ++i) {
        const RadixNode& nd = nodes[i];
        if (!nd.live || nd.children > 0) continue;
        if (best < 0 || nd.lru < nodes[best].lru) best = i;
      }
      if (best < 0) break;
      nodes[best].live = false;
      nodes[nodes[best].parent].children -= 1;
      freed->push_back(nodes[best].page);
      done++;
    }
    return done;
  }

  int64_t size() const {
    int64_t n = 0;
    for (size_t i = 1; i < nodes.size(); ++i) n += nodes[i].live;
    return n;
  }
};

// ------------------------------------------------------------ Python glue

struct PyPool {
  PyObject_HEAD
  PagePool* pool;
};
struct PyRadix {
  PyObject_HEAD
  RadixCache* cache;
};

static PyObject* list_from(const std::vector<int32_t>& v) {
  PyObject* out = PyList_New((Py_ssize_t)v.size());
  if (!out) return nullptr;
  for (Py_ssize_t i = 0; i < (Py_ssize_t)v.size(); ++i)
    PyList_SET_ITEM(out, i, PyLong_FromLong(v[i]));
  return out;
}

static bool vec_from(PyObject* seq, std::vector<int32_t>* out) {
  PyObject* fast = PySequence_Fast(seq, "expected a sequence of ints");
  if (!fast) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  out->resize(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    long v = PyLong_AsLong(PySequence_Fast_GET_ITEM(fast, i));
    if (v == -1 && PyErr_Occurred()) { Py_DECREF(fast); return false; }
    (*out)[i] = (int32_t)v;
  }
  Py_DECREF(fast);
  return true;
}

// PagePool methods ---------------------------------------------------------

static PyObject* pool_new(PyTypeObject* type, PyObject* args, PyObject*) {
  int num_pages;
  if (!PyArg_ParseTuple(args, "i", &num_pages)) return nullptr;
  if (num_pages < 0) {
    PyErr_SetString(PyExc_ValueError, "num_pages must be >= 0");
    return nullptr;
  }
  PyPool* self = (PyPool*)type->tp_alloc(type, 0);
  if (self) self->pool = new PagePool(num_pages);
  return (PyObject*)self;
}

static void pool_dealloc(PyPool* self) {
  delete self->pool;
  Py_TYPE(self)->tp_free((PyObject*)self);
}

static PyObject* pool_reserve(PyPool* self, PyObject* args) {
  int n;
  if (!PyArg_ParseTuple(args, "i", &n)) return nullptr;
  std::vector<int32_t> out;
  if (!self->pool->reserve(n, &out)) {
    PyErr_Format(PyExc_MemoryError, "page pool exhausted: need %d, have %zd",
                 n, (Py_ssize_t)self->pool->free_pages());
    return nullptr;
  }
  return list_from(out);
}

static PyObject* pool_share(PyPool* self, PyObject* args) {
  PyObject* seq;
  if (!PyArg_ParseTuple(args, "O", &seq)) return nullptr;
  std::vector<int32_t> pages;
  if (!vec_from(seq, &pages)) return nullptr;
  self->pool->share(pages.data(), (Py_ssize_t)pages.size());
  return list_from(pages);
}

static PyObject* pool_release(PyPool* self, PyObject* args) {
  PyObject* seq;
  if (!PyArg_ParseTuple(args, "O", &seq)) return nullptr;
  std::vector<int32_t> pages;
  if (!vec_from(seq, &pages)) return nullptr;
  if (self->pool->release(pages.data(), (Py_ssize_t)pages.size()) != 0) {
    PyErr_SetString(PyExc_ValueError, "double release");
    return nullptr;
  }
  Py_RETURN_NONE;
}

static PyObject* pool_free_pages(PyPool* self, void*) {
  return PyLong_FromLongLong(self->pool->free_pages());
}

static PyMethodDef pool_methods[] = {
    {"reserve", (PyCFunction)pool_reserve, METH_VARARGS, "reserve(n)"},
    {"share", (PyCFunction)pool_share, METH_VARARGS, "share(pages)"},
    {"release", (PyCFunction)pool_release, METH_VARARGS, "release(pages)"},
    {nullptr, nullptr, 0, nullptr}};

static PyGetSetDef pool_getset[] = {
    {"free_pages", (getter)pool_free_pages, nullptr, nullptr, nullptr},
    {nullptr, nullptr, nullptr, nullptr, nullptr}};

static PyTypeObject PoolType = {PyVarObject_HEAD_INIT(nullptr, 0)};

// RadixCache methods --------------------------------------------------------

static PyObject* radix_new(PyTypeObject* type, PyObject* args, PyObject*) {
  int page_size;
  if (!PyArg_ParseTuple(args, "i", &page_size)) return nullptr;
  if (page_size <= 0) {
    PyErr_SetString(PyExc_ValueError, "page_size must be > 0");
    return nullptr;
  }
  PyRadix* self = (PyRadix*)type->tp_alloc(type, 0);
  if (self) self->cache = new RadixCache(page_size);
  return (PyObject*)self;
}

static void radix_dealloc(PyRadix* self) {
  delete self->cache;
  Py_TYPE(self)->tp_free((PyObject*)self);
}

static PyObject* radix_match(PyRadix* self, PyObject* args) {
  PyObject* seq;
  if (!PyArg_ParseTuple(args, "O", &seq)) return nullptr;
  std::vector<int32_t> tokens;
  if (!vec_from(seq, &tokens)) return nullptr;
  std::vector<int32_t> pages;
  self->cache->match(tokens.data(), (Py_ssize_t)tokens.size(), &pages);
  return list_from(pages);
}

static PyObject* radix_insert(PyRadix* self, PyObject* args) {
  PyObject *tseq, *pseq;
  long start_block;
  if (!PyArg_ParseTuple(args, "OOl", &tseq, &pseq, &start_block))
    return nullptr;
  std::vector<int32_t> tokens, pages;
  if (!vec_from(tseq, &tokens) || !vec_from(pseq, &pages)) return nullptr;
  Py_ssize_t full = (Py_ssize_t)tokens.size() / self->cache->page_size;
  if ((Py_ssize_t)pages.size() < full) {
    PyErr_SetString(PyExc_ValueError,
                    "need one page id per full token block");
    return nullptr;
  }
  self->cache->insert(tokens.data(), (Py_ssize_t)tokens.size(), pages.data(),
                      start_block);
  Py_RETURN_NONE;
}

static PyObject* radix_evict(PyRadix* self, PyObject* args) {
  long n;
  if (!PyArg_ParseTuple(args, "l", &n)) return nullptr;
  std::vector<int32_t> freed;
  self->cache->evict(n, &freed);
  return list_from(freed);
}

static PyObject* radix_size(PyRadix* self, void*) {
  return PyLong_FromLongLong(self->cache->size());
}

static PyMethodDef radix_methods[] = {
    {"match", (PyCFunction)radix_match, METH_VARARGS,
     "match(tokens) -> cached prefix page ids"},
    {"insert", (PyCFunction)radix_insert, METH_VARARGS,
     "insert(tokens, pages, start_block)"},
    {"evict", (PyCFunction)radix_evict, METH_VARARGS,
     "evict(n) -> freed page ids"},
    {nullptr, nullptr, 0, nullptr}};

static PyGetSetDef radix_getset[] = {
    {"size", (getter)radix_size, nullptr, nullptr, nullptr},
    {nullptr, nullptr, nullptr, nullptr, nullptr}};

static PyTypeObject RadixType = {PyVarObject_HEAD_INIT(nullptr, 0)};

static PyModuleDef serving_module = {
    PyModuleDef_HEAD_INIT, "_sageattn_serving",
    "Native serving runtime: page pool + radix prefix cache", -1,
    nullptr, nullptr, nullptr, nullptr, nullptr};

}  // namespace

PyMODINIT_FUNC PyInit__sageattn_serving(void) {
  PoolType.tp_name = "_sageattn_serving.PagePool";
  PoolType.tp_basicsize = sizeof(PyPool);
  PoolType.tp_flags = Py_TPFLAGS_DEFAULT;
  PoolType.tp_new = pool_new;
  PoolType.tp_dealloc = (destructor)pool_dealloc;
  PoolType.tp_methods = pool_methods;
  PoolType.tp_getset = pool_getset;
  RadixType.tp_name = "_sageattn_serving.RadixCache";
  RadixType.tp_basicsize = sizeof(PyRadix);
  RadixType.tp_flags = Py_TPFLAGS_DEFAULT;
  RadixType.tp_new = radix_new;
  RadixType.tp_dealloc = (destructor)radix_dealloc;
  RadixType.tp_methods = radix_methods;
  RadixType.tp_getset = radix_getset;
  if (PyType_Ready(&PoolType) < 0 || PyType_Ready(&RadixType) < 0)
    return nullptr;
  PyObject* m = PyModule_Create(&serving_module);
  if (!m) return nullptr;
  Py_INCREF(&PoolType);
  PyModule_AddObject(m, "PagePool", (PyObject*)&PoolType);
  Py_INCREF(&RadixType);
  PyModule_AddObject(m, "RadixCache", (PyObject*)&RadixType);
  return m;
}

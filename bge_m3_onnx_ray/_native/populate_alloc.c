/* populate_alloc — numpy data-buffer allocator backed by
 * mmap(MAP_POPULATE) with a small free-list, installed via the public
 * PyDataMem_SetHandler API (numpy >= 1.22).
 *
 * Why: on this virtualized host a page install into the glibc heap
 * costs ~0.25-0.4 ms per 4 KiB page regardless of mechanism (trap
 * fault, MADV_POPULATE_WRITE, even with THP granted), while a FRESH
 * anonymous mmap with MAP_POPULATE installs the same memory at
 * ~1.5 us/page (measured: 256 MB = 0.10 s populated vs 19.2 s
 * touch-faulted). A merge-encode task whose numpy temporaries first
 * grow a worker's heap by ~170 MB therefore stalls 8-13 s once per
 * worker — ~45 of the 66 core-seconds of the whole encode stage at
 * 4M-turn scale. Routing every >= 1 MiB numpy buffer to populated
 * mmaps removes that cost structurally for all processes.
 *
 * The free-list keeps up to FREELIST_CAP recently freed mappings for
 * exact-fit-class reuse, so steady state pays no syscalls either —
 * the same high-water-mark behaviour the tuned glibc heap gave us,
 * minus the first-touch pathology. On a normal (non-virtualized)
 * host the handler is at worst neutral: MAP_POPULATE is cheap and
 * reuse skips it entirely.
 *
 * Pointer identity: every allocation we serve is recorded in an
 * open-addressing table, so free/realloc can tell our pointers from
 * ones numpy obtained from glibc before the handler was installed.
 * Disabled (module import becomes a no-op) by GRAFT_NO_POPULATE_ALLOC=1.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#include <numpy/arrayobject.h>

#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <sys/mman.h>

#define THRESH (1UL << 20)      /* route allocations >= 1 MiB */
#define PAGE 4096UL
#define FREELIST_CAP 16

typedef struct { void *ptr; size_t maplen; } ent_t;

static pthread_mutex_t g_lock = PTHREAD_MUTEX_INITIALIZER;

/* ---- live-pointer table: open addressing, grows by rebuild ---- */
static ent_t *g_tab = NULL;
static size_t g_cap = 0, g_n = 0;

static size_t slot_of(void *p, size_t cap) {
    return ((uintptr_t)p >> 12) * 0x9E3779B97F4A7C15UL >> 40 & (cap - 1);
}

static int tab_put(void *p, size_t maplen) {
    if (g_n * 2 >= g_cap) {
        size_t ncap = g_cap ? g_cap * 2 : 64;
        ent_t *nt = calloc(ncap, sizeof(ent_t));
        if (!nt) return -1;
        for (size_t i = 0; i < g_cap; i++)
            if (g_tab[i].ptr) {
                size_t s = slot_of(g_tab[i].ptr, ncap);
                while (nt[s].ptr) s = (s + 1) & (ncap - 1);
                nt[s] = g_tab[i];
            }
        free(g_tab);
        g_tab = nt;
        g_cap = ncap;
    }
    size_t s = slot_of(p, g_cap);
    while (g_tab[s].ptr) s = (s + 1) & (g_cap - 1);
    g_tab[s].ptr = p;
    g_tab[s].maplen = maplen;
    g_n++;
    return 0;
}

/* find + remove; returns maplen or 0 if absent. Robin-hood-free
 * deletion: re-insert the probe chain after the hole. */
static size_t tab_take(void *p) {
    if (!g_cap) return 0;
    size_t s = slot_of(p, g_cap);
    while (g_tab[s].ptr && g_tab[s].ptr != p) s = (s + 1) & (g_cap - 1);
    if (!g_tab[s].ptr) return 0;
    size_t maplen = g_tab[s].maplen;
    g_tab[s].ptr = NULL;
    g_n--;
    size_t i = (s + 1) & (g_cap - 1);
    while (g_tab[i].ptr) {
        ent_t e = g_tab[i];
        g_tab[i].ptr = NULL;
        g_n--;
        tab_put(e.ptr, e.maplen);
        i = (i + 1) & (g_cap - 1);
    }
    return maplen;
}

static size_t tab_peek(void *p) {
    if (!g_cap) return 0;
    size_t s = slot_of(p, g_cap);
    while (g_tab[s].ptr && g_tab[s].ptr != p) s = (s + 1) & (g_cap - 1);
    return g_tab[s].ptr ? g_tab[s].maplen : 0;
}

/* ---- free-list of retired mappings ---- */
static ent_t g_free[FREELIST_CAP];
static int g_nfree = 0;

static void *pop_map(size_t maplen) {
    /* best fit from the free-list: smallest mapping with
     * maplen <= have <= 2*maplen (bounded internal waste) */
    int best = -1;
    for (int i = 0; i < g_nfree; i++)
        if (g_free[i].maplen >= maplen && g_free[i].maplen <= 2 * maplen
            && (best < 0 || g_free[i].maplen < g_free[best].maplen))
            best = i;
    if (best >= 0) {
        void *p = g_free[best].ptr;
        size_t have = g_free[best].maplen;
        g_free[best] = g_free[--g_nfree];
        tab_put(p, have);
        return p;
    }
    void *m = mmap(NULL, maplen, PROT_READ | PROT_WRITE,
                   MAP_PRIVATE | MAP_ANONYMOUS | MAP_POPULATE, -1, 0);
    if (m == MAP_FAILED) {
        /* memory pressure: drop the free-list and retry lazily */
        for (int i = 0; i < g_nfree; i++)
            munmap(g_free[i].ptr, g_free[i].maplen);
        g_nfree = 0;
        m = mmap(NULL, maplen, PROT_READ | PROT_WRITE,
                 MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
        if (m == MAP_FAILED) return NULL;
    }
    if (tab_put(m, maplen) < 0) {
        munmap(m, maplen);
        return NULL;
    }
    return m;
}

static void pop_unmap(void *p, size_t maplen) {
    if (g_nfree < FREELIST_CAP) {
        g_free[g_nfree].ptr = p;
        g_free[g_nfree].maplen = maplen;
        g_nfree++;
        return;
    }
    /* evict the largest of (free-list + p) to bound held memory */
    int big = -1;
    size_t bl = maplen;
    for (int i = 0; i < FREELIST_CAP; i++)
        if (g_free[i].maplen > bl) { big = i; bl = g_free[i].maplen; }
    if (big >= 0) {
        munmap(g_free[big].ptr, g_free[big].maplen);
        g_free[big].ptr = p;
        g_free[big].maplen = maplen;
    } else {
        munmap(p, maplen);
    }
}

/* ---- PyDataMem_Handler hooks ---- */
static void *h_malloc(void *ctx, size_t size) {
    (void)ctx;
    if (size < THRESH) return malloc(size);
    size_t maplen = (size + PAGE - 1) & ~(PAGE - 1);
    pthread_mutex_lock(&g_lock);
    void *p = pop_map(maplen);
    pthread_mutex_unlock(&g_lock);
    return p ? p : malloc(size);
}

static void *h_calloc(void *ctx, size_t nelem, size_t elsize) {
    (void)ctx;
    if (elsize && nelem > (SIZE_MAX / elsize)) return NULL;
    size_t size = nelem * elsize;
    if (size < THRESH) return calloc(nelem, elsize);
    void *p = h_malloc(ctx, size);
    if (p) memset(p, 0, size);   /* reused mappings are not zeroed */
    return p;
}

static void h_free(void *ctx, void *ptr, size_t size) {
    (void)ctx; (void)size;
    if (!ptr) return;
    pthread_mutex_lock(&g_lock);
    size_t maplen = tab_take(ptr);
    if (maplen) pop_unmap(ptr, maplen);
    pthread_mutex_unlock(&g_lock);
    if (!maplen) free(ptr);   /* not ours (pre-handler or small) */
}

static void *h_realloc(void *ctx, void *ptr, size_t new_size) {
    (void)ctx;
    if (!ptr) return h_malloc(ctx, new_size);
    pthread_mutex_lock(&g_lock);
    size_t old_maplen = tab_peek(ptr);
    pthread_mutex_unlock(&g_lock);
    if (!old_maplen) {
        /* glibc pointer; keep it there unless it crosses the threshold
         * (realloc of numpy buffers is rare — ndarray.resize only) */
        return realloc(ptr, new_size);
    }
    if (new_size <= old_maplen && new_size >= old_maplen / 4)
        return ptr;   /* fits the existing mapping, keep it */
    void *np_ = h_malloc(ctx, new_size);
    if (!np_) return NULL;
    size_t copy = old_maplen < new_size ? old_maplen : new_size;
    memcpy(np_, ptr, copy);
    h_free(ctx, ptr, 0);
    return np_;
}

static PyDataMem_Handler g_handler = {
    "populate_alloc",
    1,
    {
        NULL,
        h_malloc,
        h_calloc,
        h_realloc,
        h_free,
    },
};

static PyObject *py_install(PyObject *self, PyObject *args) {
    (void)self; (void)args;
    PyObject *cap = PyCapsule_New(&g_handler, "mem_handler", NULL);
    if (!cap) return NULL;
    PyObject *old = PyDataMem_SetHandler(cap);
    Py_DECREF(cap);
    if (!old) return NULL;
    Py_DECREF(old);
    Py_RETURN_TRUE;
}

static PyMethodDef methods[] = {
    {"install", py_install, METH_NOARGS,
     "Install the MAP_POPULATE-backed numpy data allocator."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "populate_alloc", NULL, -1, methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit_populate_alloc(void) {
    import_array();
    return PyModule_Create(&moduledef);
}

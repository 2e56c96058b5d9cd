/* Deterministic bump allocator for the oracle build.
 *
 * The reference's k-shortest-walks queue breaks Distance ties by
 * comparing heap-node *pointers* (k_shortest_walks.hpp:231 stores
 * heap_t* in the priority-queue tuple), so its output on exact-tie
 * inputs depends on malloc's recycling behavior.  Linking this
 * allocator in makes every allocation monotonically increasing and
 * never recycled: pointer order == allocation order, giving a
 * platform-independent, exactly reproducible oracle that the engine's
 * arena-index tie-break mirrors 1:1.
 *
 * free() is a no-op — fine for the oracle's one-shot batch runs on
 * test-sized inputs (arena capped at 256 GiB of lazily-touched
 * virtual memory).
 */
#define _GNU_SOURCE
#include <stddef.h>
#include <stdint.h>
#include <string.h>
#include <sys/mman.h>
#include <unistd.h>

/* built by g++ alongside the C++ sources — the interposed symbols must
 * keep their unmangled C names or glibc never sees them */
#ifdef __cplusplus
extern "C" {
#endif

#define ARENA_BYTES (256ULL << 30)
#define ALIGN 16UL

static unsigned char *arena_base = NULL;
static size_t arena_off = 0;

static void die(const char *msg) {
    ssize_t r = write(2, msg, strlen(msg));
    (void) r;
    _exit(42);
}

static void *bump(size_t size) {
    if (arena_base == NULL) {
        void *p = mmap(NULL, ARENA_BYTES, PROT_READ | PROT_WRITE,
                       MAP_PRIVATE | MAP_ANONYMOUS | MAP_NORESERVE, -1, 0);
        if (p == MAP_FAILED) die("bump_alloc: mmap failed\n");
        arena_base = (unsigned char *) p;
    }
    size_t hdr = ALIGN; /* size header, keeps payload 16-aligned */
    size_t need = (size + hdr + ALIGN - 1) & ~(ALIGN - 1);
    if (arena_off + need > ARENA_BYTES) die("bump_alloc: arena exhausted\n");
    unsigned char *block = arena_base + arena_off;
    arena_off += need;
    *(size_t *) block = size;
    return block + hdr;
}

void *malloc(size_t size) { return bump(size ? size : 1); }

void free(void *ptr) { (void) ptr; }

void *calloc(size_t n, size_t size) {
    if (n != 0 && size > (size_t) -1 / n) return NULL;
    return bump(n * size); /* fresh pages are already zero */
}

void *realloc(void *ptr, size_t size) {
    if (ptr == NULL) return bump(size ? size : 1);
    size_t old = *(size_t *) ((unsigned char *) ptr - ALIGN);
    void *fresh = bump(size ? size : 1);
    memcpy(fresh, ptr, old < size ? old : size);
    return fresh;
}

void *aligned_alloc(size_t alignment, size_t size) {
    if (alignment <= ALIGN) return bump(size);
    /* over-allocate and round the payload up */
    size_t hdr = ALIGN;
    size_t raw = (size_t) bump(size + alignment) - hdr;
    size_t payload = (raw + hdr + alignment - 1) & ~(alignment - 1);
    *(size_t *) (payload - hdr) = size;
    return (void *) payload;
}

int posix_memalign(void **out, size_t alignment, size_t size) {
    *out = aligned_alloc(alignment, size);
    return *out ? 0 : 12 /* ENOMEM */;
}

size_t malloc_usable_size(void *ptr) {
    if (ptr == NULL) return 0;
    return *(size_t *) ((unsigned char *) ptr - ALIGN);
}

#ifdef __cplusplus
}
#endif

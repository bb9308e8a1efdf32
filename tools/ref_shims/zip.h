// Minimal libzip shim (no libzip in this container). The headless bench
// feeds the reference an image FOLDER, so the zip path is never taken;
// these stubs only satisfy the linker for DatasetReader.h.
#pragma once
#include <cstdio>
#include <cstdlib>

typedef struct zip zip_t;
typedef struct zip_file zip_file_t;
#define ZIP_RDONLY 16

static inline zip_t *zip_open(const char *, int, int *errorp) {
    if (errorp) *errorp = 1;  // report failure: zip datasets unsupported
    return nullptr;
}
static inline long zip_get_num_entries(zip_t *, int) { return 0; }
static inline const char *zip_get_name(zip_t *, unsigned long, int) {
    return nullptr;
}
static inline zip_file_t *zip_fopen(zip_t *, const char *, int) {
    return nullptr;
}
static inline long zip_fread(zip_file_t *, void *, unsigned long) {
    return -1;
}
static inline int zip_close(zip_t *) { return 0; }

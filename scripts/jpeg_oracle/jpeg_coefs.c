/* Dump quantized DCT coefficients: stdin = JPEG; stdout =
 * "NCOMP\n" then per component "ID WB HB\n" + WB*HB*64 int16 LE
 * (blocks row-major, coefficients in NATURAL order index [v*8+u]). */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>

static unsigned char *read_all(FILE *f, size_t *n) {
  size_t cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  size_t r;
  while ((r = fread(buf + len, 1, cap - len, f)) > 0) {
    len += r;
    if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
  }
  *n = len;
  return buf;
}

int main(void) {
  size_t n; unsigned char *buf = read_all(stdin, &n);
  struct jpeg_decompress_struct d;
  struct jpeg_error_mgr err;
  d.err = jpeg_std_error(&err);
  jpeg_create_decompress(&d);
  jpeg_mem_src(&d, buf, n);
  jpeg_read_header(&d, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&d);
  printf("%d\n", d.num_components);
  for (int ci = 0; ci < d.num_components; ci++) {
    jpeg_component_info *comp = d.comp_info + ci;
    int wb = comp->width_in_blocks, hb = comp->height_in_blocks;
    printf("%d %d %d\n", comp->component_id, wb, hb);
    for (int by = 0; by < hb; by++) {
      JBLOCKARRAY rows = (d.mem->access_virt_barray)
        ((j_common_ptr)&d, coefs[ci], by, 1, FALSE);
      for (int bx = 0; bx < wb; bx++) {
        fwrite(rows[0][bx], sizeof(JCOEF), DCTSIZE2, stdout);
      }
    }
  }
  return 0;
}

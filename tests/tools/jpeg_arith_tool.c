/* Test-fixture tool: encode/decode JPEGs with the system libjpeg
 * (libjpeg62-turbo, built with arithmetic-coding support) so the
 * pure-Python T.81 arithmetic decoder tier can be verified against an
 * independent implementation — the same role javax.imageio plays for
 * the Huffman baseline/progressive tiers.
 *
 *   encode <w> <h> <gray|rgb> <quality> <arith> <progressive> <restart>
 *       raw pixels on stdin (gray: w*h bytes; rgb: w*h*3) -> JPEG on stdout
 *   decode
 *       JPEG on stdin -> "w h\n" + grayscale pixels (w*h bytes) on stdout
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
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

static int do_encode(int argc, char **argv) {
  int w = atoi(argv[2]), h = atoi(argv[3]);
  int rgb = strcmp(argv[4], "rgb") == 0;
  int quality = atoi(argv[5]);
  int arith = atoi(argv[6]);
  int progressive = atoi(argv[7]);
  int restart = atoi(argv[8]);
  size_t n, want = (size_t)w * h * (rgb ? 3 : 1);
  unsigned char *px = read_all(stdin, &n);
  if (n != want) { fprintf(stderr, "want %zu pixel bytes, got %zu\n", want, n); return 2; }

  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  unsigned char *out = NULL;
  unsigned long outlen = 0;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &out, &outlen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = rgb ? 3 : 1;
  cinfo.in_color_space = rgb ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  cinfo.restart_interval = restart;
  if (progressive)
    jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = px + (size_t)cinfo.next_scanline * w * (rgb ? 3 : 1);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fwrite(out, 1, outlen, stdout);
  return 0;
}

static int do_decode(void) {
  size_t n;
  unsigned char *buf = read_all(stdin, &n);
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;
  jpeg_start_decompress(&cinfo);
  printf("%d %d\n", cinfo.output_width, cinfo.output_height);
  fflush(stdout);
  unsigned char *row = malloc(cinfo.output_width);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW r = row;
    jpeg_read_scanlines(&cinfo, &r, 1);
    fwrite(row, 1, cinfo.output_width, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

static int do_encode_coef(int argc, char **argv);
static int do_dump_coef(void);

int main(int argc, char **argv) {
  if (argc >= 4 && strcmp(argv[1], "encode_coef") == 0) return do_encode_coef(argc, argv);
  if (argc >= 2 && strcmp(argv[1], "dump_coef") == 0) return do_dump_coef();
  if (argc >= 9 && strcmp(argv[1], "encode") == 0) return do_encode(argc, argv);
  if (argc >= 2 && strcmp(argv[1], "decode") == 0) return do_decode();
  fprintf(stderr, "usage: encode <w> <h> <gray|rgb> <q> <arith> <prog> <rst> | decode\n");
  return 2;
}

/* encode_coef <w> <h>: grayscale, quant table all-ones, coefficients on
 * stdin as little-endian int16 per block (64 each, natural order, blocks
 * in raster order) -> arithmetic JPEG on stdout.  Bypasses the FDCT so
 * tests control the exact symbol sequence the arithmetic coder sees. */
static int do_encode_coef(int argc, char **argv) {
  int w = atoi(argv[2]), h = atoi(argv[3]);
  int progressive = argc > 4 ? atoi(argv[4]) : 0;
  int bw = (w + 7) / 8, bh = (h + 7) / 8;
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  unsigned char *out = NULL;
  unsigned long outlen = 0;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &out, &outlen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 1;
  cinfo.in_color_space = JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  {
    unsigned int ones[64];
    int i;
    for (i = 0; i < 64; i++) ones[i] = 1;
    jpeg_add_quant_table(&cinfo, 0, ones, 100, TRUE);
  }
  cinfo.arith_code = TRUE;
  if (progressive)
    jpeg_simple_progression(&cinfo);
  jvirt_barray_ptr coef_arrays[1];
  coef_arrays[0] = (*cinfo.mem->request_virt_barray)
    ((j_common_ptr)&cinfo, JPOOL_IMAGE, FALSE, bw, bh, 1);
  jpeg_write_coefficients(&cinfo, coef_arrays);
  for (int row = 0; row < bh; row++) {
    JBLOCKARRAY buf = (*cinfo.mem->access_virt_barray)
      ((j_common_ptr)&cinfo, coef_arrays[0], row, 1, TRUE);
    for (int col = 0; col < bw; col++) {
      short tmp[64];
      if (fread(tmp, 2, 64, stdin) != 64) { fprintf(stderr, "short coef read\n"); return 2; }
      for (int i = 0; i < 64; i++) buf[0][col][i] = tmp[i];
    }
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fwrite(out, 1, outlen, stdout);
  return 0;
}

/* dump_coef: JPEG on stdin -> "w h\n" + int16 coefficients per block
 * (64 each, natural order, raster block order) on stdout. */
static int do_dump_coef(void) {
  size_t n;
  unsigned char *buf = read_all(stdin, &n);
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, n);
  jpeg_read_header(&cinfo, TRUE);
  jvirt_barray_ptr *coefs = jpeg_read_coefficients(&cinfo);
  int bw = (cinfo.image_width + 7) / 8, bh = (cinfo.image_height + 7) / 8;
  printf("%d %d\n", cinfo.image_width, cinfo.image_height);
  fflush(stdout);
  for (int row = 0; row < bh; row++) {
    JBLOCKARRAY b = (*cinfo.mem->access_virt_barray)
      ((j_common_ptr)&cinfo, coefs[0], row, 1, FALSE);
    for (int col = 0; col < bw; col++) {
      short tmp[64];
      for (int i = 0; i < 64; i++) tmp[i] = b[0][col][i];
      fwrite(tmp, 2, 64, stdout);
    }
  }
  jpeg_finish_decompress(&cinfo);
  return 0;
}


// fastparse: native structure-file ingest for rustsasa_tpu.
//
// Parses PDB (fixed-column) and mmCIF (_atom_site loop) coordinate records
// into struct-of-arrays buffers with interned string columns (codes are
// assigned in first-appearance order, matching the Python selection layer's
// factorization).  Exposed through a C ABI consumed via ctypes; calls
// release the GIL on the Python side so a thread pool scales across cores.
//
// This is the TPU-native counterpart of the reference's reliance on the
// Rust pdbtbx parser (reference: Cargo.toml:19): the parsing work the
// reference spreads across rayon file-worker threads (main.rs:375) runs
// here as native code under Python threads.
//
// Build: g++ -O3 -march=native -shared -fPIC fastparse.cpp -o libfastparse.so -lz
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>
#include <zlib.h>

namespace {

constexpr int kStrWidth = 8;  // fixed-width interned strings (U8 on numpy side)

struct Interner {
  // Keys are the first 8 bytes NUL-padded packed into a uint64 - no string
  // allocation on the hot path.  A one-entry inline cache covers the
  // extremely repetitive columns (chain id, alt loc, residue name runs).
  std::unordered_map<uint64_t, int32_t> map;
  std::string table;  // kStrWidth bytes per entry, NUL padded
  uint64_t last_key = ~0ull;
  int32_t last_code = -1;

  static uint64_t pack(std::string_view s) {
    char buf[kStrWidth] = {0};
    size_t n = s.size() < kStrWidth ? s.size() : kStrWidth;
    memcpy(buf, s.data(), n);
    uint64_t k;
    memcpy(&k, buf, 8);
    return k;
  }

  int32_t intern(std::string_view s) {
    uint64_t key = pack(s);
    if (key == last_key) return last_code;
    auto [it, inserted] = map.try_emplace(key, static_cast<int32_t>(map.size()));
    if (inserted) {
      size_t off = table.size();
      table.resize(off + kStrWidth, '\0');
      size_t n = s.size() < kStrWidth ? s.size() : kStrWidth;
      memcpy(&table[off], s.data(), n);
    }
    last_key = key;
    last_code = it->second;
    return it->second;
  }
};

struct Builder {
  std::vector<float> coords;
  std::vector<int64_t> serial;
  std::vector<int64_t> res_serial;
  std::vector<float> occupancy;
  std::vector<float> bfactor;
  std::vector<uint8_t> hetero;
  std::vector<int32_t> chain_code, resname_code, name_code, alt_code,
      icode_code, element_code;
  Interner chain_tab, resname_tab, name_tab, alt_tab, icode_tab, element_tab;
  std::string error;
};

inline std::string_view trim(std::string_view s) {
  size_t b = 0, e = s.size();
  while (b < e && (s[b] == ' ' || s[b] == '\t' || s[b] == '\r')) ++b;
  while (e > b && (s[e - 1] == ' ' || s[e - 1] == '\t' || s[e - 1] == '\r')) --e;
  return s.substr(b, e - b);
}

inline double parse_float(std::string_view s, double dflt) {
  // Fast path for the fixed decimal notation of PDB/mmCIF numeric fields
  // ([-]ddd.ddd); falls back to strtod for exponents/specials.
  s = trim(s);
  if (s.empty()) return dflt;
  const char* p = s.data();
  const char* end = p + s.size();
  bool neg = false;
  if (*p == '-') { neg = true; ++p; }
  else if (*p == '+') ++p;
  int64_t ip = 0;
  bool any = false, simple = true;
  while (p < end && *p >= '0' && *p <= '9') {
    ip = ip * 10 + (*p - '0');
    ++p;
    any = true;
  }
  double v = static_cast<double>(ip);
  if (p < end && *p == '.') {
    ++p;
    int64_t fp = 0, scale = 1;
    while (p < end && *p >= '0' && *p <= '9') {
      fp = fp * 10 + (*p - '0');
      scale *= 10;
      ++p;
      any = true;
    }
    v += static_cast<double>(fp) / static_cast<double>(scale);
  }
  if (p != end || !any) simple = false;
  if (simple) return neg ? -v : v;
  char buf[32];
  size_t n = s.size() < 31 ? s.size() : 31;
  memcpy(buf, s.data(), n);
  buf[n] = '\0';
  char* e2 = nullptr;
  double sv = strtod(buf, &e2);
  return e2 == buf ? dflt : sv;
}

inline int64_t parse_int(std::string_view s, int64_t dflt) {
  s = trim(s);
  if (s.empty()) return dflt;
  char buf[32];
  size_t n = s.size() < 31 ? s.size() : 31;
  memcpy(buf, s.data(), n);
  buf[n] = '\0';
  char* end = nullptr;
  long long v = strtoll(buf, &end, 10);
  return end == buf ? dflt : static_cast<int64_t>(v);
}

inline std::string_view field(std::string_view line, size_t lo, size_t hi) {
  if (line.size() <= lo) return {};
  size_t end = hi < line.size() ? hi : line.size();
  return line.substr(lo, end - lo);
}

// Element inference from the raw 4-char PDB atom-name field (mirrors
// rustsasa_tpu.io.structure.infer_element).
const char* kTwoLetter[] = {
    "HE", "LI", "BE", "NE", "NA", "MG", "AL", "SI", "CL", "AR", "CA", "SC",
    "TI", "CR", "MN", "FE", "CO", "NI", "CU", "ZN", "GA", "GE", "AS", "SE",
    "BR", "KR", "RB", "SR", "ZR", "NB", "MO", "TC", "RU", "RH", "PD", "AG",
    "CD", "IN", "SN", "SB", "TE", "XE", "CS", "BA", "HG", "PB", "BI"};

std::string infer_element(std::string_view raw4) {
  char f[4] = {' ', ' ', ' ', ' '};
  for (size_t i = 0; i < raw4.size() && i < 4; ++i) f[i] = raw4[i];
  auto upper = [](char c) {
    return (c >= 'a' && c <= 'z') ? static_cast<char>(c - 32) : c;
  };
  if (f[0] == ' ' || (f[0] >= '0' && f[0] <= '9')) {
    for (int i = 0; i < 4; ++i) {
      char c = f[i];
      if (c != ' ' && !(c >= '0' && c <= '9')) return {upper(c)};
    }
    return {};
  }
  char two[3] = {upper(f[0]), upper(f[1]), '\0'};
  for (const char* e : kTwoLetter)
    if (two[0] == e[0] && two[1] == e[1]) return two;
  for (int i = 0; i < 4; ++i)
    if (f[i] != ' ') return {upper(f[i])};
  return {};
}

void parse_pdb_line(Builder& b, std::string_view line, bool hetero) {
  b.serial.push_back(parse_int(field(line, 6, 11), 0));
  std::string_view raw_name = field(line, 12, 16);
  b.name_code.push_back(b.name_tab.intern(trim(raw_name)));
  b.alt_code.push_back(b.alt_tab.intern(trim(field(line, 16, 17))));
  b.resname_code.push_back(b.resname_tab.intern(trim(field(line, 17, 20))));
  b.chain_code.push_back(b.chain_tab.intern(trim(field(line, 21, 22))));
  b.res_serial.push_back(parse_int(field(line, 22, 26), 0));
  b.icode_code.push_back(b.icode_tab.intern(trim(field(line, 26, 27))));
  b.coords.push_back(static_cast<float>(parse_float(field(line, 30, 38), 0)));
  b.coords.push_back(static_cast<float>(parse_float(field(line, 38, 46), 0)));
  b.coords.push_back(static_cast<float>(parse_float(field(line, 46, 54), 0)));
  b.occupancy.push_back(
      static_cast<float>(parse_float(field(line, 54, 60), 1.0)));
  b.bfactor.push_back(static_cast<float>(parse_float(field(line, 60, 66), 0)));
  std::string elem(trim(field(line, 76, 78)));
  for (auto& c : elem) c = (c >= 'a' && c <= 'z') ? c - 32 : c;
  if (elem.empty()) elem = infer_element(raw_name);
  b.element_code.push_back(b.element_tab.intern(elem));
  b.hetero.push_back(hetero ? 1 : 0);
}

void parse_pdb(Builder& b, std::string_view text) {
  size_t pos = 0;
  while (pos < text.size()) {
    size_t eol = text.find('\n', pos);
    if (eol == std::string_view::npos) eol = text.size();
    std::string_view line = text.substr(pos, eol - pos);
    pos = eol + 1;
    if (line.size() >= 4 && memcmp(line.data(), "ATOM", 4) == 0) {
      parse_pdb_line(b, line, false);
    } else if (line.size() >= 6 && memcmp(line.data(), "HETATM", 6) == 0) {
      parse_pdb_line(b, line, true);
    } else if (line.size() >= 6 && memcmp(line.data(), "ENDMDL", 6) == 0) {
      break;  // first model only
    }
  }
}

// ---- mmCIF ----

struct CifCols {
  int group = -1, id = -1, type_symbol = -1, label_atom_id = -1,
      auth_atom_id = -1, label_alt_id = -1, label_comp_id = -1,
      auth_comp_id = -1, label_asym_id = -1, auth_asym_id = -1,
      label_seq_id = -1, auth_seq_id = -1, ins_code = -1, x = -1, y = -1,
      z = -1, occ = -1, biso = -1, model = -1;
  int n = 0;
};

inline std::string_view cif_clean(std::string_view s) {
  s = trim(s);
  if (s == "." || s == "?") return {};
  if (s.size() >= 2 && (s.front() == '\'' || s.front() == '"') &&
      s.back() == s.front())
    return s.substr(1, s.size() - 2);
  return s;
}

void parse_cif(Builder& b, std::string_view text) {
  size_t pos = 0;
  CifCols cols;
  bool in_tags = false, in_data = false;
  std::vector<std::string_view> toks;
  std::string first_model;
  while (pos < text.size()) {
    size_t eol = text.find('\n', pos);
    if (eol == std::string_view::npos) eol = text.size();
    std::string_view line = text.substr(pos, eol - pos);
    pos = eol + 1;
    std::string_view t = trim(line);
    if (!in_data) {
      if (!in_tags) {
        if (t.size() > 11 && memcmp(t.data(), "_atom_site.", 11) == 0) {
          in_tags = true;
          cols = CifCols();
        } else {
          continue;
        }
      }
      if (t.size() > 11 && memcmp(t.data(), "_atom_site.", 11) == 0) {
        std::string_view key = t.substr(11);
        size_t sp = key.find_first_of(" \t");
        if (sp != std::string_view::npos) key = key.substr(0, sp);
        int idx = cols.n++;
        if (key == "group_PDB") cols.group = idx;
        else if (key == "id") cols.id = idx;
        else if (key == "type_symbol") cols.type_symbol = idx;
        else if (key == "label_atom_id") cols.label_atom_id = idx;
        else if (key == "auth_atom_id") cols.auth_atom_id = idx;
        else if (key == "label_alt_id") cols.label_alt_id = idx;
        else if (key == "label_comp_id") cols.label_comp_id = idx;
        else if (key == "auth_comp_id") cols.auth_comp_id = idx;
        else if (key == "label_asym_id") cols.label_asym_id = idx;
        else if (key == "auth_asym_id") cols.auth_asym_id = idx;
        else if (key == "label_seq_id") cols.label_seq_id = idx;
        else if (key == "auth_seq_id") cols.auth_seq_id = idx;
        else if (key == "pdbx_PDB_ins_code") cols.ins_code = idx;
        else if (key == "Cartn_x") cols.x = idx;
        else if (key == "Cartn_y") cols.y = idx;
        else if (key == "Cartn_z") cols.z = idx;
        else if (key == "occupancy") cols.occ = idx;
        else if (key == "B_iso_or_equiv") cols.biso = idx;
        else if (key == "pdbx_PDB_model_num") cols.model = idx;
        continue;
      }
      // First non-tag line after tags -> data begins (fall through).
      in_data = true;
    }
    if (t.empty() || t[0] == '#' || t[0] == '_' ||
        (t.size() >= 5 && memcmp(t.data(), "loop_", 5) == 0) ||
        (t.size() >= 5 && memcmp(t.data(), "data_", 5) == 0))
      break;

    // Tokenize (handles simple quoted tokens).
    toks.clear();
    size_t i = 0;
    while (i < t.size()) {
      while (i < t.size() && (t[i] == ' ' || t[i] == '\t')) ++i;
      if (i >= t.size()) break;
      if (t[i] == '\'' || t[i] == '"') {
        char q = t[i];
        size_t j = t.find(q, i + 1);
        if (j == std::string_view::npos) j = t.size();
        toks.push_back(t.substr(i, j + 1 - i));
        i = j + 1;
      } else {
        size_t j = i;
        while (j < t.size() && t[j] != ' ' && t[j] != '\t') ++j;
        toks.push_back(t.substr(i, j - i));
        i = j;
      }
    }
    if (static_cast<int>(toks.size()) != cols.n) continue;  // ragged row

    auto get = [&](int idx) -> std::string_view {
      return idx >= 0 ? cif_clean(toks[idx]) : std::string_view{};
    };
    if (cols.model >= 0) {
      std::string_view m = get(cols.model);
      if (first_model.empty()) first_model = std::string(m);
      else if (m != first_model) break;  // first model only
    }
    std::string_view grp = get(cols.group);
    b.hetero.push_back(grp == "HETATM" ? 1 : 0);
    b.serial.push_back(cols.id >= 0 ? parse_int(get(cols.id), 0)
                                    : static_cast<int64_t>(b.serial.size()));
    std::string_view nm =
        cols.auth_atom_id >= 0 ? get(cols.auth_atom_id) : get(cols.label_atom_id);
    b.name_code.push_back(b.name_tab.intern(nm));
    b.alt_code.push_back(b.alt_tab.intern(get(cols.label_alt_id)));
    std::string_view comp =
        cols.auth_comp_id >= 0 ? get(cols.auth_comp_id) : get(cols.label_comp_id);
    b.resname_code.push_back(b.resname_tab.intern(comp));
    std::string_view asym =
        cols.auth_asym_id >= 0 ? get(cols.auth_asym_id) : get(cols.label_asym_id);
    b.chain_code.push_back(b.chain_tab.intern(asym));
    std::string_view seq =
        cols.auth_seq_id >= 0 ? get(cols.auth_seq_id) : get(cols.label_seq_id);
    b.res_serial.push_back(parse_int(seq, 0));
    b.icode_code.push_back(b.icode_tab.intern(get(cols.ins_code)));
    b.coords.push_back(static_cast<float>(parse_float(get(cols.x), 0)));
    b.coords.push_back(static_cast<float>(parse_float(get(cols.y), 0)));
    b.coords.push_back(static_cast<float>(parse_float(get(cols.z), 0)));
    b.occupancy.push_back(static_cast<float>(parse_float(get(cols.occ), 1.0)));
    b.bfactor.push_back(static_cast<float>(parse_float(get(cols.biso), 0)));
    std::string elem(get(cols.type_symbol));
    for (auto& c : elem) c = (c >= 'a' && c <= 'z') ? c - 32 : c;
    if (elem.empty() && !nm.empty()) {
      std::string padded = nm.size() < 4 ? " " + std::string(nm) : std::string(nm);
      elem = infer_element(padded);
    }
    b.element_code.push_back(b.element_tab.intern(elem));
  }
}

bool read_file(const char* path, std::string& out, std::string& err) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    err = "failed to open file";
    return false;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(size));
  size_t got = size ? fread(&out[0], 1, static_cast<size_t>(size), f) : 0;
  fclose(f);
  if (got != static_cast<size_t>(size)) {
    err = "short read";
    return false;
  }
  // gzip?
  if (out.size() >= 2 && static_cast<uint8_t>(out[0]) == 0x1f &&
      static_cast<uint8_t>(out[1]) == 0x8b) {
    std::string inflated;
    inflated.resize(out.size() * 6 + (1 << 16));
    z_stream zs{};
    if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) {
      err = "inflateInit failed";
      return false;
    }
    zs.next_in = reinterpret_cast<Bytef*>(&out[0]);
    zs.avail_in = static_cast<uInt>(out.size());
    size_t written = 0;
    int rc = Z_OK;
    while (rc != Z_STREAM_END) {
      if (written == inflated.size()) inflated.resize(inflated.size() * 2);
      zs.next_out = reinterpret_cast<Bytef*>(&inflated[written]);
      zs.avail_out = static_cast<uInt>(inflated.size() - written);
      rc = inflate(&zs, Z_NO_FLUSH);
      written = inflated.size() - zs.avail_out;
      if (rc != Z_OK && rc != Z_STREAM_END) {
        inflateEnd(&zs);
        err = "gzip inflate failed";
        return false;
      }
    }
    inflateEnd(&zs);
    inflated.resize(written);
    out.swap(inflated);
  }
  return true;
}

bool looks_like_cif(const char* path, std::string_view text) {
  std::string_view p(path);
  auto ends_with = [&](std::string_view s, std::string_view suf) {
    return s.size() >= suf.size() &&
           s.compare(s.size() - suf.size(), suf.size(), suf) == 0;
  };
  std::string_view base = p;
  if (ends_with(base, ".gz")) base = base.substr(0, base.size() - 3);
  if (ends_with(base, ".cif") || ends_with(base, ".mmcif")) return true;
  if (ends_with(base, ".pdb") || ends_with(base, ".ent") ||
      ends_with(base, ".pdb1"))
    return false;
  std::string_view head = text.substr(0, text.size() < 4096 ? text.size() : 4096);
  return head.find("data_") != std::string_view::npos ||
         text.substr(0, text.size() < 65536 ? text.size() : 65536)
                 .find("_atom_site.") != std::string_view::npos;
}

}  // namespace

extern "C" {

struct FPResult {
  int64_t n;
  float* coords;
  int64_t* serial;
  int64_t* res_serial;
  float* occupancy;
  float* bfactor;
  uint8_t* hetero;
  int32_t* chain_code;
  int32_t* resname_code;
  int32_t* name_code;
  int32_t* alt_code;
  int32_t* icode_code;
  int32_t* element_code;
  char* chain_tab;
  int32_t n_chain;
  char* resname_tab;
  int32_t n_resname;
  char* name_tab;
  int32_t n_name;
  char* alt_tab;
  int32_t n_alt;
  char* icode_tab;
  int32_t n_icode;
  char* element_tab;
  int32_t n_element;
  int32_t is_cif;
  char error[256];
  Builder* owner;  // opaque, for free
};

FPResult* fastparse_file(const char* path) {
  auto* b = new Builder();
  auto* r = new FPResult();
  memset(r->error, 0, sizeof(r->error));
  r->owner = b;
  std::string text, err;
  if (!read_file(path, text, err)) {
    snprintf(r->error, sizeof(r->error), "%s: %s", err.c_str(), path);
    return r;
  }
  bool is_cif = looks_like_cif(path, text);
  r->is_cif = is_cif ? 1 : 0;
  if (is_cif) parse_cif(*b, text);
  else parse_pdb(*b, text);

  r->n = static_cast<int64_t>(b->serial.size());
  r->coords = b->coords.data();
  r->serial = b->serial.data();
  r->res_serial = b->res_serial.data();
  r->occupancy = b->occupancy.data();
  r->bfactor = b->bfactor.data();
  r->hetero = b->hetero.data();
  r->chain_code = b->chain_code.data();
  r->resname_code = b->resname_code.data();
  r->name_code = b->name_code.data();
  r->alt_code = b->alt_code.data();
  r->icode_code = b->icode_code.data();
  r->element_code = b->element_code.data();
  r->chain_tab = b->chain_tab.table.data();
  r->n_chain = static_cast<int32_t>(b->chain_tab.map.size());
  r->resname_tab = b->resname_tab.table.data();
  r->n_resname = static_cast<int32_t>(b->resname_tab.map.size());
  r->name_tab = b->name_tab.table.data();
  r->n_name = static_cast<int32_t>(b->name_tab.map.size());
  r->alt_tab = b->alt_tab.table.data();
  r->n_alt = static_cast<int32_t>(b->alt_tab.map.size());
  r->icode_tab = b->icode_tab.table.data();
  r->n_icode = static_cast<int32_t>(b->icode_tab.map.size());
  r->element_tab = b->element_tab.table.data();
  r->n_element = static_cast<int32_t>(b->element_tab.map.size());
  return r;
}

void fastparse_free(FPResult* r) {
  if (!r) return;
  delete r->owner;
  delete r;
}

}  // extern "C"

// Native trie tokenizer — C ABI for ctypes binding.
//
// Byte-trie greedy longest-match encoding with <0xNN> byte fallback,
// behaviorally identical to the Python implementation in
// xalm_tpu/tokenizer.py (contract per reference src/tokenizer.cpp:56-119;
// written from that behavioral spec, not a copy). Host-side hot path for
// long-prompt workloads (passkey mode encodes ~100k+ chars).
//
// Build: g++ -O2 -std=c++17 -shared -fPIC tokenizer.cpp -o libxalm_native.so

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

// Dense child tables keep the inner loop branch-light (one load per byte);
// vocab tries are shallow so the memory cost is acceptable.
struct Node {
    int32_t token_id = -1;
    int32_t children[256];
    Node() { std::memset(children, -1, sizeof(children)); }
};

struct Tokenizer {
    std::vector<Node> nodes;          // node 0 = root
    std::vector<std::string> vocab;   // token id -> bytes
    int32_t byte_fallback_start = -1;
    int32_t eot_id = -1;
    int32_t bos_id = -1;
    int32_t eos_id = -1;

    void build(const uint8_t* blob, size_t len) {
        nodes.emplace_back();
        size_t i = 0;
        while (i < len) {
            size_t start = i;
            while (i < len && blob[i] != 0) i++;
            vocab.emplace_back(reinterpret_cast<const char*>(blob + start), i - start);
            i++;  // skip NUL
        }
        for (size_t id = 0; id < vocab.size(); id++) {
            const std::string& w = vocab[id];
            if (w.empty()) continue;
            int32_t cur = 0;
            for (unsigned char c : w) {
                int32_t nxt = nodes[cur].children[c];
                if (nxt < 0) {
                    nxt = static_cast<int32_t>(nodes.size());
                    nodes[cur].children[c] = nxt;
                    nodes.emplace_back();
                }
                cur = nxt;
            }
            nodes[cur].token_id = static_cast<int32_t>(id);
        }
        for (size_t id = 0; id < vocab.size(); id++) {
            const std::string& w = vocab[id];
            if (w == "<0x00>") byte_fallback_start = static_cast<int32_t>(id);
            else if (w == "<|eot_id|>" || w == "<|end|>" || w == "<|im_end|>")
                eot_id = static_cast<int32_t>(id);
        }
    }

    size_t encode(const uint8_t* text, size_t len, int32_t* out, size_t cap,
                  bool bos) const {
        size_t n = 0;
        if (bos && n < cap) out[n++] = bos_id;
        size_t i = 0;
        while (i < len && n < cap) {
            int32_t node = 0;
            int32_t best_id = -1;
            size_t best_len = 0;
            size_t l = 0;
            while (i + l < len) {
                int32_t nxt = nodes[node].children[text[i + l]];
                if (nxt < 0) break;
                node = nxt;
                l++;
                if (nodes[node].token_id >= 0) {
                    best_id = nodes[node].token_id;
                    best_len = l;
                }
            }
            if (best_id < 0) {
                if (byte_fallback_start >= 0) out[n++] = text[i] + byte_fallback_start;
                i += 1;
            } else {
                out[n++] = best_id;
                i += best_len;
            }
        }
        return n;
    }
};

extern "C" {

void* xalm_tokenizer_create(const uint8_t* blob, size_t len, int32_t bos_id,
                            int32_t eos_id) {
    auto* t = new Tokenizer();
    t->bos_id = bos_id;
    t->eos_id = eos_id;
    t->build(blob, len);
    return t;
}

void xalm_tokenizer_destroy(void* tok) { delete static_cast<Tokenizer*>(tok); }

// returns number of tokens written (caller sizes out as len+1)
size_t xalm_tokenizer_encode(void* tok, const uint8_t* text, size_t len,
                             int32_t* out, size_t cap, int32_t bos) {
    return static_cast<Tokenizer*>(tok)->encode(text, len, out, cap, bos != 0);
}

int32_t xalm_tokenizer_byte_fallback_start(void* tok) {
    return static_cast<Tokenizer*>(tok)->byte_fallback_start;
}

int32_t xalm_tokenizer_eot_id(void* tok) {
    return static_cast<Tokenizer*>(tok)->eot_id;
}

size_t xalm_tokenizer_vocab_size(void* tok) {
    return static_cast<Tokenizer*>(tok)->vocab.size();
}

}  // extern "C"

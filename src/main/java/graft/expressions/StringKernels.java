package graft.expressions;

import org.apache.spark.unsafe.types.UTF8String;

/**
 * Row-level string kernels backing the custom Catalyst Expressions.
 *
 * Static Java methods so whole-stage-codegen'd Java can call them directly
 * (graft.expressions.StringKernels.xxx(...)). Each implements the semantics
 * of a reference kernel the Spark built-ins can't express (SURVEY.md §4):
 * the reference's Numba kernels in fletcher/algorithms/string.py do the same
 * work per Arrow chunk; here Tungsten hands us one UTF8String per row inside
 * generated code, which is the Spark-native shape of the same loop.
 */
public final class StringKernels {
    private StringKernels() {}

    /** KMP failure table over pattern bytes (fail[i] = length of the longest
     *  proper border of p[0..i]). O(m) build, shared by count/replace. */
    private static int[] kmpFailure(byte[] p) {
        int[] fail = new int[p.length];
        int k = 0;
        for (int i = 1; i < p.length; i++) {
            while (k > 0 && p[i] != p[k]) k = fail[k - 1];
            if (p[i] == p[k]) k++;
            fail[i] = k;
        }
        return fail;
    }

    /**
     * Count non-overlapping literal occurrences; empty pattern counts
     * len+1 (Python str.count semantics; reference string.py:163-237).
     * KMP over raw UTF-8 bytes (self-synchronizing, so byte-level matching
     * is correct for literal patterns): O(n+m) worst case — adversarial
     * needles like "aaa…ab" (the reference's benchmark workload,
     * benchmarks/text.py:18) stay linear.
     */
    public static int countLiteral(UTF8String str, UTF8String pat) {
        if (pat.numBytes() == 0) {
            return str.numChars() + 1;
        }
        byte[] s = str.getBytes();
        byte[] p = pat.getBytes();
        int[] fail = kmpFailure(p);
        int count = 0, k = 0;
        for (int i = 0; i < s.length; i++) {
            while (k > 0 && s[i] != p[k]) k = fail[k - 1];
            if (s[i] == p[k]) k++;
            if (k == p.length) { count++; k = 0; }  // non-overlapping: restart
        }
        return count;
    }

    /** Tiny grow-on-demand byte buffer for kernels building UTF-8 output
     *  directly (skips the UTF8String→String→UTF8String round-trip). */
    private static byte[] ensure(byte[] buf, int len, int need) {
        if (len + need <= buf.length) return buf;
        int cap = Math.max(buf.length * 2, len + need);
        return java.util.Arrays.copyOf(buf, cap);
    }

    /**
     * Replace the first n non-overlapping occurrences (n < 0 = all).
     * Empty pattern interleaves the replacement (Python str.replace
     * semantics; reference string.py:331-393 empty-pattern kernel).
     * Pure byte-level: KMP match over UTF-8 bytes (self-synchronizing, so
     * literal byte matches are codepoint matches) and output assembled as
     * bytes — no String materialization on the hot path.
     */
    public static UTF8String replaceN(UTF8String str, UTF8String pat,
                                      UTF8String repl, int n) {
        if (n == 0) return str;
        byte[] s = str.getBytes();
        byte[] p = pat.getBytes();
        byte[] r = repl.getBytes();
        int done = 0;
        if (p.length == 0) {
            // interleave: repl before every codepoint and at the end
            byte[] out = new byte[s.length + r.length * (str.numChars() + 1)];
            int o = 0, i = 0;
            while (i < s.length) {
                if (n < 0 || done < n) {
                    System.arraycopy(r, 0, out, o, r.length);
                    o += r.length; done++;
                }
                int w = UTF8String.numBytesForFirstByte(s[i]);
                System.arraycopy(s, i, out, o, w);
                o += w; i += w;
            }
            if (n < 0 || done < n) {
                System.arraycopy(r, 0, out, o, r.length);
                o += r.length;
            }
            return UTF8String.fromBytes(java.util.Arrays.copyOf(out, o));
        }
        int[] fail = kmpFailure(p);
        byte[] out = new byte[s.length + 16];
        int o = 0, k = 0, copied = 0;
        for (int i = 0; i < s.length && (n < 0 || done < n); i++) {
            while (k > 0 && s[i] != p[k]) k = fail[k - 1];
            if (s[i] == p[k]) k++;
            if (k == p.length) {
                int head = i + 1 - p.length - copied;  // unmatched prefix
                out = ensure(out, o, head + r.length);
                System.arraycopy(s, copied, out, o, head);
                o += head;
                System.arraycopy(r, 0, out, o, r.length);
                o += r.length;
                copied = i + 1;
                k = 0;  // non-overlapping
                done++;
            }
        }
        int tail = s.length - copied;
        out = ensure(out, o, tail);
        System.arraycopy(s, copied, out, o, tail);
        o += tail;
        return UTF8String.fromBytes(java.util.Arrays.copyOf(out, o));
    }

    /**
     * Python slice semantics by codepoint: s[start:end:step], negative
     * indices and negative step supported (reference string.py:727-908).
     * start/end use Integer.MIN_VALUE as "not given".
     */
    public static UTF8String sliceCodepoints(UTF8String str, int start,
                                             int end, int step) {
        if (step == 0) throw new IllegalArgumentException("slice step cannot be zero");
        String s = str.toString();
        int[] cps = s.codePoints().toArray();
        int len = cps.length;
        long b, e;
        if (step > 0) {
            b = start == Integer.MIN_VALUE ? 0 : (start < 0 ? Math.max(len + start, 0) : Math.min(start, len));
            e = end == Integer.MIN_VALUE ? len : (end < 0 ? Math.max(len + end, 0) : Math.min(end, len));
        } else {
            b = start == Integer.MIN_VALUE ? len - 1 : (start < 0 ? Math.max(len + start, -1) : Math.min(start, len - 1));
            e = end == Integer.MIN_VALUE ? -1 : (end < 0 ? Math.max(len + end, -1) : Math.min(end, len - 1));
        }
        StringBuilder out = new StringBuilder();
        if (step > 0) {
            for (long i = b; i < e; i += step) out.appendCodePoint(cps[(int) i]);
        } else {
            for (long i = b; i > e; i += step) out.appendCodePoint(cps[(int) i]);
        }
        return UTF8String.fromString(out.toString());
    }

    // ---- Unicode class predicates (Python str.is* semantics; the reference
    // delegates to Arrow utf8proc, string_mixin.py:38-91). Empty string →
    // false for all, matching Python/pandas. ----

    public static boolean isAlpha(UTF8String str) {
        String s = str.toString();
        if (s.isEmpty()) return false;
        return s.codePoints().allMatch(Character::isLetter);
    }

    public static boolean isDigit(UTF8String str) {
        String s = str.toString();
        if (s.isEmpty()) return false;
        return s.codePoints().allMatch(Character::isDigit);
    }

    public static boolean isAlnum(UTF8String str) {
        String s = str.toString();
        if (s.isEmpty()) return false;
        return s.codePoints().allMatch(Character::isLetterOrDigit);
    }

    public static boolean isSpace(UTF8String str) {
        String s = str.toString();
        if (s.isEmpty()) return false;
        return s.codePoints().allMatch(
            cp -> Character.isWhitespace(cp) || Character.isSpaceChar(cp));
    }

    public static boolean isLower(UTF8String str) {
        String s = str.toString();
        boolean cased = false;
        for (int i = 0; i < s.length();) {
            int cp = s.codePointAt(i);
            if (Character.isUpperCase(cp) || Character.isTitleCase(cp)) return false;
            if (Character.isLowerCase(cp)) cased = true;
            i += Character.charCount(cp);
        }
        return cased;
    }

    public static boolean isUpper(UTF8String str) {
        String s = str.toString();
        boolean cased = false;
        for (int i = 0; i < s.length();) {
            int cp = s.codePointAt(i);
            if (Character.isLowerCase(cp) || Character.isTitleCase(cp)) return false;
            if (Character.isUpperCase(cp)) cased = true;
            i += Character.charCount(cp);
        }
        return cased;
    }

    /** Python istitle: cased runs must start upper/title then lower. */
    public static boolean isTitle(UTF8String str) {
        String s = str.toString();
        boolean cased = false, prevCased = false;
        for (int i = 0; i < s.length();) {
            int cp = s.codePointAt(i);
            boolean up = Character.isUpperCase(cp) || Character.isTitleCase(cp);
            boolean lo = Character.isLowerCase(cp);
            if (up) {
                if (prevCased) return false;
                cased = true; prevCased = true;
            } else if (lo) {
                if (!prevCased) return false;
                cased = true; prevCased = true;
            } else {
                prevCased = false;
            }
            i += Character.charCount(cp);
        }
        return cased;
    }

    /** Python isnumeric: digits + numeric category (Nl, No). */
    public static boolean isNumeric(UTF8String str) {
        String s = str.toString();
        if (s.isEmpty()) return false;
        return s.codePoints().allMatch(cp -> {
            int t = Character.getType(cp);
            return Character.isDigit(cp) || t == Character.LETTER_NUMBER
                || t == Character.OTHER_NUMBER;
        });
    }

    /** Python isdecimal: Nd only. */
    public static boolean isDecimal(UTF8String str) {
        String s = str.toString();
        if (s.isEmpty()) return false;
        return s.codePoints().allMatch(
            cp -> Character.getType(cp) == Character.DECIMAL_DIGIT_NUMBER);
    }

    /**
     * Unicode case folding (Python str.casefold flavor). The upper→lower
     * round-trip handles the full-fold expansions (ß→SS→ss) that plain
     * toLowerCase misses.
     */
    public static UTF8String caseFold(UTF8String str) {
        String s = str.toString();
        return UTF8String.fromString(
            s.toUpperCase(java.util.Locale.ROOT).toLowerCase(java.util.Locale.ROOT));
    }

    /** Unicode normalization via java.text.Normalizer (NFC/NFD/NFKC/NFKD). */
    public static UTF8String normalize(UTF8String str, UTF8String form) {
        return UTF8String.fromString(java.text.Normalizer.normalize(
            str.toString(), java.text.Normalizer.Form.valueOf(form.toString())));
    }

    /**
     * Pandas str.zfill: left-pad with '0', keeping a leading sign in place.
     */
    public static UTF8String zfill(UTF8String str, int width) {
        String s = str.toString();
        if (s.length() >= width) return str;
        boolean signed = !s.isEmpty() && (s.charAt(0) == '-' || s.charAt(0) == '+');
        StringBuilder out = new StringBuilder(width);
        int padLen = width - s.length();
        if (signed) out.append(s.charAt(0));
        for (int i = 0; i < padLen; i++) out.append('0');
        out.append(signed ? s.substring(1) : s);
        return UTF8String.fromString(out.toString());
    }

    /**
     * Greedy word-wrap at width (pandas str.wrap defaults: collapse runs of
     * whitespace between words, break words longer than width), newline-joined.
     */
    public static UTF8String wrap(UTF8String str, int width) {
        String[] words = str.toString().trim().split("\\s+");
        StringBuilder out = new StringBuilder();
        int lineLen = 0;
        for (String w : words) {
            if (w.isEmpty()) continue;
            while (w.length() > width) {
                int room = width - lineLen - (lineLen > 0 ? 1 : 0);
                if (room <= 0) { out.append('\n'); lineLen = 0; room = width; }
                else if (lineLen > 0) { out.append(' '); lineLen++; }
                out.append(w, 0, Math.min(room, w.length()));
                lineLen += Math.min(room, w.length());
                w = w.substring(Math.min(room, w.length()));
                if (!w.isEmpty()) { out.append('\n'); lineLen = 0; }
            }
            if (w.isEmpty()) continue;
            if (lineLen == 0) { out.append(w); lineLen = w.length(); }
            else if (lineLen + 1 + w.length() <= width) {
                out.append(' ').append(w); lineLen += 1 + w.length();
            } else { out.append('\n').append(w); lineLen = w.length(); }
        }
        return UTF8String.fromString(out.toString());
    }

    /**
     * Python str.rfind: 0-based codepoint index of the LAST occurrence of
     * sub, -1 if absent; empty sub finds at len (reference
     * tests/test_text.py:605 — rindex shares these semantics).
     */
    public static int rfindLiteral(UTF8String str, UTF8String sub) {
        String s = str.toString();
        String p = sub.toString();
        int idx = s.lastIndexOf(p);
        if (idx < 0) return -1;
        return s.codePointCount(0, idx);
    }

    /**
     * One element of Python partition/rpartition(sep): idx 0 = head,
     * 1 = sep-if-found, 2 = tail. fromRight splits at the LAST occurrence.
     * Not-found convention matches Python: partition → (s, '', ''),
     * rpartition → ('', '', s). (reference tests/test_text.py:625)
     */
    public static UTF8String partitionPart(UTF8String str, UTF8String sep,
                                           int idx, boolean fromRight) {
        String s = str.toString();
        String p = sep.toString();
        int at = fromRight ? s.lastIndexOf(p) : s.indexOf(p);
        String out;
        if (at < 0) {
            if (fromRight) out = idx == 2 ? s : "";
            else out = idx == 0 ? s : "";
        } else {
            out = idx == 0 ? s.substring(0, at)
                : idx == 1 ? p
                : s.substring(at + p.length());
        }
        return UTF8String.fromString(out);
    }

    /**
     * Python str.rsplit(sep, maxsplit): at most n splits taken from the
     * RIGHT (n < 0 = unlimited, equal to split). Literal separator.
     * (reference tests/test_text.py:693)
     */
    public static org.apache.spark.sql.catalyst.util.GenericArrayData rsplitArray(
            UTF8String str, UTF8String sep, int n) {
        String s = str.toString();
        String p = sep.toString();
        java.util.ArrayList<UTF8String> parts = new java.util.ArrayList<>();
        int end = s.length(), done = 0;
        while (n < 0 || done < n) {
            int at = s.lastIndexOf(p, end - p.length());
            if (at < 0 || p.isEmpty()) break;
            parts.add(UTF8String.fromString(s.substring(at + p.length(), end)));
            end = at;
            done++;
        }
        parts.add(UTF8String.fromString(s.substring(0, end)));
        java.util.Collections.reverse(parts);
        return new org.apache.spark.sql.catalyst.util.GenericArrayData(
            parts.toArray());
    }

    /**
     * Pandas str.slice_replace(start, stop, repl) = s[:start] + repl +
     * s[stop:] with Python codepoint slice boundaries (negatives clamp;
     * Integer.MIN_VALUE = "not given" → 0 / len).
     * (reference tests/test_text.py:668)
     */
    public static UTF8String sliceReplace(UTF8String str, int start, int stop,
                                          UTF8String repl) {
        String s = str.toString();
        int len = s.codePointCount(0, s.length());
        int b = start == Integer.MIN_VALUE ? 0
            : (start < 0 ? Math.max(len + start, 0) : Math.min(start, len));
        int e = stop == Integer.MIN_VALUE ? len
            : (stop < 0 ? Math.max(len + stop, 0) : Math.min(stop, len));
        if (e < b) e = b;  // Python: s[:b] + repl + s[e:] with e>=b floor
        int bOff = s.offsetByCodePoints(0, b);
        int eOff = s.offsetByCodePoints(0, e);
        return UTF8String.fromString(
            s.substring(0, bOff) + repl.toString() + s.substring(eOff));
    }

    /**
     * Python str.swapcase: case swap (upper/title → lower, lower → upper),
     * including one-to-many special mappings (ß→SS, ﬁ→FI) via String-level
     * case conversion per codepoint. (reference tests/test_text.py:773)
     */
    public static UTF8String swapCase(UTF8String str) {
        String s = str.toString();
        StringBuilder out = new StringBuilder(s.length());
        for (int i = 0; i < s.length();) {
            int cp = s.codePointAt(i);
            String one = new String(Character.toChars(cp));
            if (Character.isUpperCase(cp) || Character.isTitleCase(cp)) {
                out.append(one.toLowerCase(java.util.Locale.ROOT));
            } else if (Character.isLowerCase(cp)) {
                out.append(one.toUpperCase(java.util.Locale.ROOT));
            } else {
                out.append(one);
            }
            i += Character.charCount(cp);
        }
        return UTF8String.fromString(out.toString());
    }

    /**
     * Polynomial rolling hash over codepoints: h = fold(h*31 + cp) mod 1e9+7.
     * Matches DuckDB `list_reduce(list_prepend(0, [unicode(c) ...]),
     * (acc,c) -> (acc*31+c) % 1000000007)` exactly — the cross-engine
     * document fingerprint primitive (also the MinHash base hash).
     */
    public static final long POLY_MOD = 1_000_000_007L;

    public static long polyHash(UTF8String str) {
        String s = str.toString();
        long h = 0;
        for (int i = 0; i < s.length();) {
            int cp = s.codePointAt(i);
            h = (h * 31 + cp) % POLY_MOD;
            i += Character.charCount(cp);
        }
        return h;
    }

    /**
     * DEFLATE-compressed byte length of the string's UTF-8 bytes at the
     * given level — the incompressibility quality signal (natural text
     * compresses ~3-4x; boilerplate/repetition far more; gibberish/random
     * hardly at all). The Deflater is thread-local-reused: codegen calls
     * this once per row and per-row allocation of the native zlib stream
     * would dominate the kernel.
     *
     * Determinism: fixed level + default strategy on the JDK's bundled
     * zlib — stable within a JVM/cluster (every executor ships the same
     * JDK), which is what the partitioning-invariance contract needs; NOT
     * pinned across zlib versions, which is why this signal is spec-pinned
     * rather than DuckDB-oracled.
     */
    public static int deflateLen(UTF8String str, int level) {
        java.util.zip.Deflater d = DEFLATERS.get();
        d.reset();
        d.setLevel(level);
        byte[] in = str.getBytes();
        d.setInput(in);
        d.finish();
        // fixed thread-local scratch: output bytes are only COUNTED, so the
        // loop drains any size through one reused buffer — a per-row
        // allocation here would defeat the point of reusing the Deflater
        byte[] buf = DEFLATE_SCRATCH.get();
        int total = 0;
        // NB: the first deflate() after setLevel() returns 0 (it flushes the
        // level change) — loop on finished(), never on "returned 0".
        while (!d.finished()) {
            total += d.deflate(buf);
        }
        return total;
    }

    private static final ThreadLocal<java.util.zip.Deflater> DEFLATERS =
        ThreadLocal.withInitial(() -> new java.util.zip.Deflater());

    private static final ThreadLocal<byte[]> DEFLATE_SCRATCH =
        ThreadLocal.withInitial(() -> new byte[1 << 16]);
}

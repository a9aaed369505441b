/* fastser.c — C accelerator for the pretty-print HTML serializer.
 *
 * Strict subset of jsoup_spark/clean/serializer.py (_Pretty + _traverse +
 * escape_entities fast path), which remains the source of truth and the
 * fallback. Covers ONLY the dominant output configuration:
 *   pretty=True, outline=False, indent_amount=1, max_padding=30,
 *   syntax="html", escape_mode in (base, extended), UTF output charset
 * (the Python wrapper gates on settings; base and extended only differ on
 * non-UTF charsets). Reference semantics: nodes/Printer.java:58-238,
 * nodes/Entities.java doEscape, nodes/Attribute.java:191-320.
 *
 * Bails (returns None -> caller falls back to Python) on: unknown node
 * classes, non-dict attrs, non-string attr keys, depth > 768. A bail is
 * per-document and loses no correctness — only speed.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

/* ---------------------------------------------------------------- state */

static PyObject *g_element = NULL, *g_pseudo = NULL, *g_document = NULL,
    *g_textnode = NULL, *g_cdata = NULL, *g_datanode = NULL,
    *g_comment = NULL, *g_doctype = NULL, *g_xmldecl = NULL;
static PyObject *g_html_flags = NULL;   /* dict: name -> flags (NS_HTML) */
static PyObject *g_tag_flags = NULL;    /* dict: (ns, name) -> flags */
static PyObject *g_ns_html = NULL;
static PyObject *g_bool_attrs = NULL;   /* frozenset of lowercase names */
static long F_KNOWN, F_VOID, F_BLOCK, F_INLINE_CONT, F_SELF_CLOSE,
    F_SEEN_SELF_CLOSE, F_PRESERVE;

static PyObject *s_parent = NULL, *s_children = NULL, *s_name = NULL,
    *s_ns = NULL, *s_flags = NULL, *s_tagcase = NULL, *s_attrs = NULL,
    *s_value = NULL, *s_public_id = NULL, *s_system_id = NULL,
    *s_internal_subset = NULL, *s_is_declaration = NULL, *s_lower = NULL,
    *s_br = NULL;

/* escape option bits — mirror serializer.py */
#define FOR_TEXT      1
#define FOR_ATTRIBUTE 2
#define NORMALISE     4
#define TRIM_LEADING  8
#define TRIM_TRAILING 16

#define S_BAIL 2
#define MAX_DEPTH 768

static int
init_interned(void)
{
    if (s_parent != NULL)
        return 0;
    s_parent = PyUnicode_InternFromString("parent");
    s_children = PyUnicode_InternFromString("children");
    s_name = PyUnicode_InternFromString("name");
    s_ns = PyUnicode_InternFromString("ns");
    s_flags = PyUnicode_InternFromString("flags");
    s_tagcase = PyUnicode_InternFromString("tag_name_case");
    s_attrs = PyUnicode_InternFromString("attrs");
    s_value = PyUnicode_InternFromString("value");
    s_public_id = PyUnicode_InternFromString("public_id");
    s_system_id = PyUnicode_InternFromString("system_id");
    s_internal_subset = PyUnicode_InternFromString("internal_subset");
    s_is_declaration = PyUnicode_InternFromString("is_declaration");
    s_lower = PyUnicode_InternFromString("lower");
    s_br = PyUnicode_InternFromString("br");
    if (s_br == NULL)
        return -1;
    return 0;
}

static PyObject *
configure(PyObject *self, PyObject *args)
{
    PyObject *element, *pseudo, *document, *textnode, *cdata, *datanode,
        *comment, *doctype, *xmldecl, *html_flags, *tag_flags, *ns_html,
        *bool_attrs;
    long known, fvoid, block, inline_cont, self_close, seen_sc, preserve;
    if (!PyArg_ParseTuple(args, "OOOOOOOOOOOOOlllllll",
                          &element, &pseudo, &document, &textnode, &cdata,
                          &datanode, &comment, &doctype, &xmldecl,
                          &html_flags, &tag_flags, &ns_html, &bool_attrs,
                          &known, &fvoid, &block, &inline_cont, &self_close,
                          &seen_sc, &preserve))
        return NULL;
#define SETG(g, v) Py_XDECREF(g); Py_INCREF(v); g = v
    SETG(g_element, element);
    SETG(g_pseudo, pseudo);
    SETG(g_document, document);
    SETG(g_textnode, textnode);
    SETG(g_cdata, cdata);
    SETG(g_datanode, datanode);
    SETG(g_comment, comment);
    SETG(g_doctype, doctype);
    SETG(g_xmldecl, xmldecl);
    SETG(g_html_flags, html_flags);
    SETG(g_tag_flags, tag_flags);
    SETG(g_ns_html, ns_html);
    SETG(g_bool_attrs, bool_attrs);
#undef SETG
    F_KNOWN = known;
    F_VOID = fvoid;
    F_BLOCK = block;
    F_INLINE_CONT = inline_cont;
    F_SELF_CLOSE = self_close;
    F_SEEN_SELF_CLOSE = seen_sc;
    F_PRESERVE = preserve;
    Py_RETURN_NONE;
}

/* ------------------------------------------------------- UCS4 accumulator */

typedef struct {
    Py_UCS4 *buf;
    Py_ssize_t len, cap;
} Accum;

static int
acc_reserve(Accum *a, Py_ssize_t extra)
{
    if (a->len + extra <= a->cap)
        return 0;
    Py_ssize_t ncap = a->cap ? a->cap : 1024;
    while (ncap < a->len + extra)
        ncap *= 2;
    Py_UCS4 *nb = PyMem_Realloc(a->buf, ncap * sizeof(Py_UCS4));
    if (nb == NULL) {
        PyErr_NoMemory();
        return -1;
    }
    a->buf = nb;
    a->cap = ncap;
    return 0;
}

static int
acc_cstr(Accum *a, const char *s)
{
    Py_ssize_t n = (Py_ssize_t)strlen(s);
    if (acc_reserve(a, n) < 0)
        return -1;
    for (Py_ssize_t i = 0; i < n; i++)
        a->buf[a->len++] = (Py_UCS4)(unsigned char)s[i];
    return 0;
}

static int
acc_ch(Accum *a, Py_UCS4 c)
{
    if (acc_reserve(a, 1) < 0)
        return -1;
    a->buf[a->len++] = c;
    return 0;
}

static int
acc_unicode(Accum *a, PyObject *u)
{
    Py_ssize_t n = PyUnicode_GET_LENGTH(u);
    if (acc_reserve(a, n) < 0)
        return -1;
    int kind = PyUnicode_KIND(u);
    const void *data = PyUnicode_DATA(u);
    for (Py_ssize_t i = 0; i < n; i++)
        a->buf[a->len++] = PyUnicode_READ(kind, data, i);
    return 0;
}

/* numeric hex escape &#x...; (lowercase, no padding — %x) */
static int
acc_hex_escape(Accum *a, Py_UCS4 c)
{
    char tmp[16];
    snprintf(tmp, sizeof tmp, "&#x%x;", (unsigned)c);
    return acc_cstr(a, tmp);
}

/* -------------------------------------------------------------- helpers */

static long
get_flags(PyObject *el)
{
    PyObject *fl = PyObject_GetAttr(el, s_flags);
    if (fl == NULL)
        return -1;
    if (!PyLong_Check(fl)) {
        Py_DECREF(fl);
        PyErr_SetString(PyExc_TypeError, "flags not int");
        return -1;
    }
    long v = PyLong_AsLong(fl);
    Py_DECREF(fl);
    return v;
}

/* tags.is_known(name, ns) via the module flag tables (same dict objects) */
static int
is_known_tag(PyObject *name, PyObject *ns)
{
    int html = (ns == g_ns_html);
    if (!html) {
        if (!PyUnicode_Check(ns))
            return -1;
        html = (PyUnicode_Compare(ns, g_ns_html) == 0);
        if (html == 0 && PyErr_Occurred())
            return -1;
    }
    if (html)
        return PyDict_Contains(g_html_flags, name);
    PyObject *key = PyTuple_Pack(2, ns, name);
    if (key == NULL)
        return -1;
    int r = PyDict_Contains(g_tag_flags, key);
    Py_DECREF(key);
    return r;
}

/* TextNode-or-subclass with all chars in " \t\n\f\r\xa0" + U+200B U+AD */
static int
is_blank_text(PyObject *node)
{
    if (node == NULL || node == Py_None)
        return 0;
    if (!PyObject_TypeCheck(node, (PyTypeObject *)g_textnode))
        return 0;
    PyObject *v = PyObject_GetAttr(node, s_value);
    if (v == NULL)
        return -1;
    if (!PyUnicode_Check(v)) {
        Py_DECREF(v);
        return -1;
    }
    Py_ssize_t n = PyUnicode_GET_LENGTH(v);
    int kind = PyUnicode_KIND(v);
    const void *data = PyUnicode_DATA(v);
    int blank = 1;
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_UCS4 c = PyUnicode_READ(kind, data, i);
        if (c != ' ' && c != '\t' && c != '\n' && c != '\f' && c != '\r' &&
            c != 0xA0 && c != 0x200B && c != 0xAD) {
            blank = 0;
            break;
        }
    }
    Py_DECREF(v);
    return blank;
}

static int has_child_blocks(PyObject *el);

/* _Pretty.is_block_el (outline=False) — 1/0/-1 */
static int
is_block_el(PyObject *node)
{
    if (node == NULL || node == Py_None)
        return 0;
    if (!PyObject_TypeCheck(node, (PyTypeObject *)g_element))
        return 0;
    PyObject *name = PyObject_GetAttr(node, s_name);
    if (name == NULL)
        return -1;
    if (PyUnicode_Check(name) && PyUnicode_Compare(name, s_br) == 0) {
        Py_DECREF(name);
        return 1;
    }
    long fl = get_flags(node);
    if (fl < 0) {
        Py_DECREF(name);
        return -1;
    }
    if (fl & F_BLOCK) {
        Py_DECREF(name);
        return 1;
    }
    int r = 0;
    if (!(fl & F_KNOWN)) {
        PyObject *ns = PyObject_GetAttr(node, s_ns);
        if (ns == NULL) {
            Py_DECREF(name);
            return -1;
        }
        int known = is_known_tag(name, ns);
        Py_DECREF(ns);
        if (known < 0) {
            Py_DECREF(name);
            return -1;
        }
        if (!known) {
            PyObject *par = PyObject_GetAttr(node, s_parent);
            if (par == NULL) {
                Py_DECREF(name);
                return -1;
            }
            if (par != Py_None &&
                PyObject_TypeCheck(par, (PyTypeObject *)g_document))
                r = 1;
            else
                r = has_child_blocks(node);
            Py_DECREF(par);
        }
    }
    Py_DECREF(name);
    return r;
}

/* _Pretty._has_child_blocks — 1/0/-1 */
static int
has_child_blocks(PyObject *el)
{
    PyObject *ch = PyObject_GetAttr(el, s_children);
    if (ch == NULL || !PyList_Check(ch)) {
        Py_XDECREF(ch);
        return -1;
    }
    int n = 0, r = 0;
    for (Py_ssize_t i = 0; i < PyList_GET_SIZE(ch); i++) {
        PyObject *c = PyList_GET_ITEM(ch, i);
        if (!PyObject_TypeCheck(c, (PyTypeObject *)g_element))
            continue;
        long fl = get_flags(c);
        if (fl < 0) {
            r = -1;
            break;
        }
        if (fl & F_BLOCK) {
            r = 1;
            break;
        }
        PyObject *cn = PyObject_GetAttr(c, s_name);
        if (cn == NULL) {
            r = -1;
            break;
        }
        PyObject *cns = PyObject_GetAttr(c, s_ns);
        if (cns == NULL) {
            Py_DECREF(cn);
            r = -1;
            break;
        }
        int known = is_known_tag(cn, cns);
        Py_DECREF(cn);
        Py_DECREF(cns);
        if (known < 0) {
            r = -1;
            break;
        }
        if (!known) {
            r = 1;
            break;
        }
        n++;
        if (n >= 5)
            break;
    }
    Py_DECREF(ch);
    return r;
}

/* _Pretty._has_non_text: any of the first <=5 children not a TextNode */
static int
has_non_text(PyObject *el)
{
    PyObject *ch = PyObject_GetAttr(el, s_children);
    if (ch == NULL || !PyList_Check(ch)) {
        Py_XDECREF(ch);
        return -1;
    }
    int r = 0;
    for (Py_ssize_t i = 0; i < PyList_GET_SIZE(ch); i++) {
        PyObject *c = PyList_GET_ITEM(ch, i);
        if (!PyObject_TypeCheck(c, (PyTypeObject *)g_textnode)) {
            r = 1;
            break;
        }
        if (i >= 4)
            break;
    }
    Py_DECREF(ch);
    return r;
}

/* previous non-blank sibling: scan back from idx-1 in children (borrowed).
 * Returns borrowed node or NULL; *out_idx its index (or -1). -2 on error. */
static PyObject *
prev_nonblank(PyObject *children, Py_ssize_t idx, Py_ssize_t *out_idx,
              int *errp)
{
    *errp = 0;
    *out_idx = -1;
    if (children == NULL)
        return NULL;
    for (Py_ssize_t j = idx - 1; j >= 0; j--) {
        PyObject *c = PyList_GET_ITEM(children, j);
        int b = is_blank_text(c);
        if (b < 0) {
            *errp = 1;
            return NULL;
        }
        if (!b) {
            *out_idx = j;
            return c;
        }
    }
    return NULL;
}

/* first non-blank node at or after idx (borrowed) or NULL */
static PyObject *
next_nonblank(PyObject *children, Py_ssize_t idx, Py_ssize_t *out_idx,
              int *errp)
{
    *errp = 0;
    *out_idx = -1;
    if (children == NULL)
        return NULL;
    Py_ssize_t n = PyList_GET_SIZE(children);
    for (Py_ssize_t j = idx; j < n; j++) {
        PyObject *c = PyList_GET_ITEM(children, j);
        int b = is_blank_text(c);
        if (b < 0) {
            *errp = 1;
            return NULL;
        }
        if (!b) {
            *out_idx = j;
            return c;
        }
    }
    return NULL;
}

/* ------------------------------------------------------ printer context */

typedef struct {
    Accum out;
    int preserve;
    PyObject *root;   /* indent-exempt node (borrowed) */
} Ser;

/* _Pretty.should_indent. node borrowed; children = node's parent's children
 * list (borrowed, may be NULL when parentless); idx = node's index there.
 * Returns 1/0/-1. */
static int
should_indent(Ser *s, PyObject *node, PyObject *children, Py_ssize_t idx)
{
    if (node == NULL || node == Py_None || node == s->root || s->preserve)
        return 0;
    int b = is_blank_text(node);
    if (b)
        return b < 0 ? -1 : 0;
    b = is_block_el(node);
    if (b)
        return b;
    int err = 0;
    Py_ssize_t pidx;
    PyObject *prev = prev_nonblank(children, idx, &pidx, &err);
    if (err)
        return -1;
    b = is_block_el(prev);
    if (b)
        return b;
    PyObject *parent = PyObject_GetAttr(node, s_parent);
    if (parent == NULL)
        return -1;
    int pb = is_block_el(parent);
    if (pb < 0) {
        Py_DECREF(parent);
        return -1;
    }
    int stop = !pb;
    if (!stop &&
        PyObject_TypeCheck(parent, (PyTypeObject *)g_element)) {
        long pfl = get_flags(parent);
        if (pfl < 0) {
            Py_DECREF(parent);
            return -1;
        }
        if (pfl & F_INLINE_CONT)
            stop = 1;
        else {
            int hnt = has_non_text(parent);
            if (hnt < 0) {
                Py_DECREF(parent);
                return -1;
            }
            if (!hnt)
                stop = 1;
        }
    }
    Py_DECREF(parent);
    if (stop)
        return 0;
    if (prev == NULL)
        return 1;
    if (PyObject_TypeCheck(prev, (PyTypeObject *)g_textnode))
        return 0;
    b = is_block_el(prev);
    if (b < 0)
        return -1;
    if (b)
        return 1;
    return !PyObject_TypeCheck(prev, (PyTypeObject *)g_element);
}

static int
indent(Ser *s, Py_ssize_t depth)
{
    /* indent_amount=1, max_padding=30 (gated by the Python wrapper) */
    Py_ssize_t pad = depth < 30 ? depth : 30;
    if (acc_reserve(&s->out, pad + 1) < 0)
        return -1;
    s->out.buf[s->out.len++] = '\n';
    for (Py_ssize_t i = 0; i < pad; i++)
        s->out.buf[s->out.len++] = ' ';
    return 0;
}

/* escape_entities fast path (UTF charset, base/extended): optional
 * normalise+trim, then minimal escaping. opts = FOR_TEXT/FOR_ATTRIBUTE/
 * NORMALISE/TRIM_*. For attributes here: FOR_ATTRIBUTE only (no quotes in
 * text mode, no apostrophe unless FOR_ATTRIBUTE|FOR_TEXT — the printer
 * never uses that combination; XmlDecl/attr values use FOR_ATTRIBUTE). */
static int
escape_into(Accum *a, PyObject *text, int opts)
{
    if (!PyUnicode_Check(text)) {
        PyErr_SetString(PyExc_TypeError, "text not str");
        return -1;
    }
    Py_ssize_t n = PyUnicode_GET_LENGTH(text);
    int kind = PyUnicode_KIND(text);
    const void *data = PyUnicode_DATA(text);
    int normalise = opts & NORMALISE;
    int attr = opts & FOR_ATTRIBUTE;
    int pending = 0, started = 0;
    if (acc_reserve(a, n) < 0)
        return -1;
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_UCS4 c = PyUnicode_READ(kind, data, i);
        if (normalise &&
            (c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r')) {
            pending = 1;
            continue;
        }
        if (pending) {
            if (started || !(opts & TRIM_LEADING)) {
                if (acc_ch(a, ' ') < 0)
                    return -1;
            }
            pending = 0;
        }
        started = 1;
        switch (c) {
        case '&':
            if (acc_cstr(a, "&amp;") < 0)
                return -1;
            break;
        case '<':
            if (acc_cstr(a, "&lt;") < 0)
                return -1;
            break;
        case '>':
            if (acc_cstr(a, "&gt;") < 0)
                return -1;
            break;
        case 0xA0:
            if (acc_cstr(a, "&nbsp;") < 0)
                return -1;
            break;
        case '"':
            if (attr) {
                if (acc_cstr(a, "&quot;") < 0)
                    return -1;
            } else if (acc_ch(a, c) < 0)
                return -1;
            break;
        default:
            if (c <= 0x08 || c == 0x0B || c == 0x0C ||
                (c >= 0x0E && c <= 0x1F)) {
                /* \f only reaches here in non-normalise mode */
                if (acc_hex_escape(a, c) < 0)
                    return -1;
            } else if (acc_ch(a, c) < 0)
                return -1;
        }
    }
    if (pending && !(opts & TRIM_TRAILING) &&
        !(!started && (opts & TRIM_LEADING))) {
        if (acc_ch(a, ' ') < 0)
            return -1;
    }
    return 0;
}

/* _valid_key (html syntax): substitute runs of bad chars with "_".
 * Returns new ref (the key itself or a fresh string) or NULL to skip
 * the attribute (empty key); -1 signalled via *errp. */
static inline int
bad_key_char(Py_UCS4 c)
{
    return c <= 0x1F || (c >= 0x7F && c <= 0x9F) || c == ' ' || c == '"' ||
           c == '\'' || c == '/' || c == '=';
}

static PyObject *
valid_key_html(PyObject *key, int *errp)
{
    *errp = 0;
    Py_ssize_t n = PyUnicode_GET_LENGTH(key);
    if (n == 0)
        return NULL;   /* skip */
    int kind = PyUnicode_KIND(key);
    const void *data = PyUnicode_DATA(key);
    int any_bad = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        if (bad_key_char(PyUnicode_READ(kind, data, i))) {
            any_bad = 1;
            break;
        }
    }
    if (!any_bad) {
        Py_INCREF(key);
        return key;
    }
    Py_UCS4 *tmp = PyMem_Malloc(n * sizeof(Py_UCS4));
    if (tmp == NULL) {
        PyErr_NoMemory();
        *errp = 1;
        return NULL;
    }
    Py_ssize_t m = 0;
    int in_run = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_UCS4 c = PyUnicode_READ(kind, data, i);
        if (bad_key_char(c)) {
            if (!in_run)
                tmp[m++] = '_';
            in_run = 1;
        } else {
            tmp[m++] = c;
            in_run = 0;
        }
    }
    PyObject *r = PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND, tmp, m);
    PyMem_Free(tmp);
    if (r == NULL)
        *errp = 1;
    return r;   /* m >= 1 always (n > 0) */
}

/* ascii-lower into a fresh string when needed; returns new ref */
static PyObject *
lower_str(PyObject *u)
{
    Py_ssize_t n = PyUnicode_GET_LENGTH(u);
    int kind = PyUnicode_KIND(u);
    const void *data = PyUnicode_DATA(u);
    int ascii_only = 1, any_upper = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_UCS4 c = PyUnicode_READ(kind, data, i);
        if (c > 0x7F) {
            ascii_only = 0;
            break;
        }
        if (c >= 'A' && c <= 'Z')
            any_upper = 1;
    }
    if (ascii_only) {
        if (!any_upper) {
            Py_INCREF(u);
            return u;
        }
        Py_UCS4 *tmp = PyMem_Malloc(n * sizeof(Py_UCS4));
        if (tmp == NULL)
            return PyErr_NoMemory();
        for (Py_ssize_t i = 0; i < n; i++) {
            Py_UCS4 c = PyUnicode_READ(kind, data, i);
            tmp[i] = (c >= 'A' && c <= 'Z') ? c + 32 : c;
        }
        PyObject *r = PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND, tmp, n);
        PyMem_Free(tmp);
        return r;
    }
    return PyObject_CallMethodNoArgs(u, s_lower);
}

/* _attrs_html — 0/-1/S_BAIL */
static int
attrs_html(Ser *s, PyObject *el)
{
    PyObject *attrs = PyObject_GetAttr(el, s_attrs);
    if (attrs == NULL)
        return -1;
    if (!PyDict_Check(attrs)) {
        Py_DECREF(attrs);
        return S_BAIL;
    }
    Py_ssize_t pos = 0;
    PyObject *key, *val;
    int rc = 0;
    while (PyDict_Next(attrs, &pos, &key, &val)) {
        if (!PyUnicode_Check(key)) {
            rc = S_BAIL;
            break;
        }
        if (val != Py_None && !PyUnicode_Check(val)) {
            rc = S_BAIL;
            break;
        }
        int err = 0;
        PyObject *vkey = valid_key_html(key, &err);
        if (err) {
            rc = -1;
            break;
        }
        if (vkey == NULL)
            continue;
        if (acc_ch(&s->out, ' ') < 0 || acc_unicode(&s->out, vkey) < 0) {
            Py_DECREF(vkey);
            rc = -1;
            break;
        }
        /* boolean-attr collapse (html syntax) */
        if (val == Py_None) {
            Py_DECREF(vkey);
            continue;
        }
        PyObject *lkey = lower_str(vkey);
        if (lkey == NULL) {
            Py_DECREF(vkey);
            rc = -1;
            break;
        }
        int is_bool = PySet_Contains(g_bool_attrs, lkey);
        if (is_bool < 0) {
            Py_DECREF(lkey);
            Py_DECREF(vkey);
            rc = -1;
            break;
        }
        int collapse = 0;
        if (is_bool) {
            if (PyUnicode_GET_LENGTH(val) == 0)
                collapse = 1;
            else {
                PyObject *lval = lower_str(val);
                if (lval == NULL) {
                    Py_DECREF(lkey);
                    Py_DECREF(vkey);
                    rc = -1;
                    break;
                }
                collapse = (PyUnicode_Compare(lval, lkey) == 0);
                Py_DECREF(lval);
                if (!collapse && PyErr_Occurred()) {
                    Py_DECREF(lkey);
                    Py_DECREF(vkey);
                    rc = -1;
                    break;
                }
            }
        }
        Py_DECREF(lkey);
        Py_DECREF(vkey);
        if (collapse)
            continue;
        if (acc_cstr(&s->out, "=\"") < 0 ||
            escape_into(&s->out, val, FOR_ATTRIBUTE) < 0 ||
            acc_ch(&s->out, '"') < 0) {
            rc = -1;
            break;
        }
    }
    Py_DECREF(attrs);
    return rc;
}

/* _el_head — 0/-1/S_BAIL. kids = el.children (borrowed list). */
static int
el_head(Ser *s, PyObject *el, PyObject *kids)
{
    PyObject *name = PyObject_GetAttr(el, s_tagcase);
    if (name == NULL)
        return -1;
    if (!PyUnicode_Check(name)) {
        Py_DECREF(name);
        return S_BAIL;
    }
    int rc = 0;
    if (acc_ch(&s->out, '<') < 0 || acc_unicode(&s->out, name) < 0)
        rc = -1;
    if (rc == 0)
        rc = attrs_html(s, el);
    if (rc == 0) {
        if (PyList_GET_SIZE(kids) == 0) {
            long fl = get_flags(el);
            if (fl < 0)
                rc = -1;
            else {
                PyObject *ns = PyObject_GetAttr(el, s_ns);
                if (ns == NULL)
                    rc = -1;
                else {
                    int html_ns = (ns == g_ns_html) ||
                        (PyUnicode_Check(ns) &&
                         PyUnicode_Compare(ns, g_ns_html) == 0);
                    if (PyErr_Occurred())
                        rc = -1;
                    Py_DECREF(ns);
                    if (rc == 0) {
                        if (!html_ns &&
                            ((fl & F_SEEN_SELF_CLOSE) ||
                             ((fl & F_KNOWN) &&
                              (fl & (F_VOID | F_SELF_CLOSE))))) {
                            if (acc_cstr(&s->out, " />") < 0)
                                rc = -1;
                        } else if (html_ns && (fl & F_VOID)) {
                            if (acc_ch(&s->out, '>') < 0)
                                rc = -1;
                        } else {
                            if (acc_cstr(&s->out, "></") < 0 ||
                                acc_unicode(&s->out, name) < 0 ||
                                acc_ch(&s->out, '>') < 0)
                                rc = -1;
                        }
                    }
                }
            }
        } else {
            if (acc_ch(&s->out, '>') < 0)
                rc = -1;
        }
    }
    Py_DECREF(name);
    return rc;
}

/* _Pretty.add_head (pseudo handled by caller) — 0/-1/S_BAIL */
static int
add_head(Ser *s, PyObject *el, PyObject *kids, Py_ssize_t depth,
         PyObject *sib, Py_ssize_t sidx)
{
    int si = should_indent(s, el, sib, sidx);
    if (si < 0)
        return -1;
    if (si && indent(s, depth) < 0)
        return -1;
    int rc = el_head(s, el, kids);
    if (rc != 0)
        return rc;
    long fl = get_flags(el);
    if (fl < 0)
        return -1;
    if (fl & F_PRESERVE)
        s->preserve = 1;
    return 0;
}

/* _Pretty.add_tail — 0/-1 */
static int
add_tail(Ser *s, PyObject *el, PyObject *kids, Py_ssize_t depth)
{
    int err = 0;
    Py_ssize_t j;
    PyObject *first_nb = next_nonblank(kids, 0, &j, &err);
    if (err)
        return -1;
    int si = should_indent(s, first_nb, kids, j);
    if (si < 0)
        return -1;
    if (si && indent(s, depth) < 0)
        return -1;
    if (PyList_GET_SIZE(kids) > 0) {
        PyObject *name = PyObject_GetAttr(el, s_tagcase);
        if (name == NULL)
            return -1;
        int rc = 0;
        if (!PyUnicode_Check(name))
            rc = S_BAIL;
        else if (acc_cstr(&s->out, "</") < 0 ||
                 acc_unicode(&s->out, name) < 0 ||
                 acc_ch(&s->out, '>') < 0)
            rc = -1;
        Py_DECREF(name);
        if (rc != 0)
            return rc;
    }
    long fl = get_flags(el);
    if (fl < 0)
        return -1;
    if (s->preserve && (fl & F_PRESERVE)) {
        PyObject *p = PyObject_GetAttr(el, s_parent);
        if (p == NULL)
            return -1;
        int keep = 0;
        while (p != Py_None) {
            if (PyObject_TypeCheck(p, (PyTypeObject *)g_element)) {
                long pfl = get_flags(p);
                if (pfl < 0) {
                    Py_DECREF(p);
                    return -1;
                }
                if (pfl & F_PRESERVE) {
                    keep = 1;
                    break;
                }
            }
            PyObject *nx = PyObject_GetAttr(p, s_parent);
            Py_DECREF(p);
            if (nx == NULL)
                return -1;
            p = nx;
        }
        Py_DECREF(p);
        if (!keep)
            s->preserve = 0;
    }
    return 0;
}

/* _Pretty._text_trim — returns opts or -1 */
static int
text_trim(Ser *s, PyObject *node, PyObject *children, Py_ssize_t idx,
          int opts)
{
    PyObject *parent = PyObject_GetAttr(node, s_parent);
    if (parent == NULL)
        return -1;
    int pb = is_block_el(parent);
    Py_DECREF(parent);
    if (pb < 0)
        return -1;
    if (!pb)
        return opts;
    Py_ssize_t n = children ? PyList_GET_SIZE(children) : 0;
    PyObject *prev = (children && idx > 0)
        ? PyList_GET_ITEM(children, idx - 1) : NULL;
    PyObject *nxt = (children && idx + 1 < n)
        ? PyList_GET_ITEM(children, idx + 1) : NULL;
    int prev_inline_el = 0;
    if (prev != NULL &&
        PyObject_TypeCheck(prev, (PyTypeObject *)g_element)) {
        int b = is_block_el(prev);
        if (b < 0)
            return -1;
        prev_inline_el = !b;
    }
    if (!prev_inline_el) {
        if (prev == NULL)
            opts |= TRIM_LEADING;
        else if (!PyObject_TypeCheck(prev, (PyTypeObject *)g_textnode)) {
            int si = should_indent(s, prev, children, idx - 1);
            if (si < 0)
                return -1;
            if (si)
                opts |= TRIM_LEADING;
        }
    }
    int trail = 0;
    if (nxt == NULL)
        trail = 1;
    else if (!PyObject_TypeCheck(nxt, (PyTypeObject *)g_textnode)) {
        int si = should_indent(s, nxt, children, idx + 1);
        if (si < 0)
            return -1;
        trail = si;
    }
    if (trail) {
        opts |= TRIM_TRAILING;
    } else {
        int err = 0;
        Py_ssize_t j;
        PyObject *nn = next_nonblank(children, idx + 1, &j, &err);
        if (err)
            return -1;
        if (nn != NULL &&
            PyObject_TypeCheck(nn, (PyTypeObject *)g_textnode)) {
            PyObject *v = PyObject_GetAttr(nn, s_value);
            if (v == NULL)
                return -1;
            if (PyUnicode_Check(v) && PyUnicode_GET_LENGTH(v) > 0) {
                Py_UCS4 c0 = PyUnicode_READ_CHAR(v, 0);
                if (c0 == ' ' || c0 == '\t' || c0 == '\n' || c0 == '\r' ||
                    c0 == '\f')
                    opts |= TRIM_TRAILING;
            }
            Py_DECREF(v);
        }
    }
    return opts;
}

/* _Pretty.add_text (exact TextNode) — 0/-1 */
static int
add_text(Ser *s, PyObject *node, Py_ssize_t depth, PyObject *children,
         Py_ssize_t idx)
{
    PyObject *v = PyObject_GetAttr(node, s_value);
    if (v == NULL)
        return -1;
    if (!PyUnicode_Check(v)) {
        Py_DECREF(v);
        return S_BAIL;
    }
    int opts = FOR_TEXT;
    int rc = 0;
    if (!s->preserve) {
        opts |= NORMALISE;
        opts = text_trim(s, node, children, idx, opts);
        if (opts < 0)
            rc = -1;
        if (rc == 0) {
            int blank = is_blank_text(node);
            if (blank < 0)
                rc = -1;
            else if (!blank) {
                PyObject *parent = PyObject_GetAttr(node, s_parent);
                if (parent == NULL)
                    rc = -1;
                else {
                    int pb = is_block_el(parent);
                    Py_DECREF(parent);
                    if (pb < 0)
                        rc = -1;
                    else if (pb) {
                        int si = should_indent(s, node, children, idx);
                        if (si < 0)
                            rc = -1;
                        else if (si && indent(s, depth) < 0)
                            rc = -1;
                    }
                }
            }
        }
    }
    if (rc == 0 && escape_into(&s->out, v, opts) < 0)
        rc = -1;
    Py_DECREF(v);
    return rc;
}

/* _leaf_html for html syntax — 0/-1/S_BAIL */
static int
leaf_html(Ser *s, PyObject *node)
{
    PyTypeObject *tp = Py_TYPE(node);
    if (tp == (PyTypeObject *)g_cdata) {
        PyObject *v = PyObject_GetAttr(node, s_value);
        if (v == NULL)
            return -1;
        int rc = 0;
        if (!PyUnicode_Check(v))
            rc = S_BAIL;
        else if (acc_cstr(&s->out, "<![CDATA[") < 0 ||
                 acc_unicode(&s->out, v) < 0 ||
                 acc_cstr(&s->out, "]]>") < 0)
            rc = -1;
        Py_DECREF(v);
        return rc;
    }
    if (tp == (PyTypeObject *)g_datanode) {
        PyObject *v = PyObject_GetAttr(node, s_value);
        if (v == NULL)
            return -1;
        int rc = 0;
        if (!PyUnicode_Check(v))
            rc = S_BAIL;
        else if (acc_unicode(&s->out, v) < 0)
            rc = -1;
        Py_DECREF(v);
        return rc;
    }
    if (tp == (PyTypeObject *)g_comment) {
        PyObject *v = PyObject_GetAttr(node, s_value);
        if (v == NULL)
            return -1;
        int rc = 0;
        if (!PyUnicode_Check(v))
            rc = S_BAIL;
        else if (acc_cstr(&s->out, "<!--") < 0 ||
                 acc_unicode(&s->out, v) < 0 ||
                 acc_cstr(&s->out, "-->") < 0)
            rc = -1;
        Py_DECREF(v);
        return rc;
    }
    if (tp == (PyTypeObject *)g_doctype) {
        PyObject *v = PyObject_GetAttr(node, s_value);
        PyObject *pid = PyObject_GetAttr(node, s_public_id);
        PyObject *sid = PyObject_GetAttr(node, s_system_id);
        PyObject *isub = PyObject_GetAttr(node, s_internal_subset);
        if (isub == NULL) {
            PyErr_Clear();
            isub = Py_None;
            Py_INCREF(isub);
        }
        int rc = 0;
        if (v == NULL || pid == NULL || sid == NULL)
            rc = -1;
        else if (!PyUnicode_Check(v) || !PyUnicode_Check(pid) ||
                 !PyUnicode_Check(sid))
            rc = S_BAIL;
        else {
            int has_pid = PyUnicode_GET_LENGTH(pid) > 0;
            int has_sid = PyUnicode_GET_LENGTH(sid) > 0;
            if (acc_cstr(&s->out, (!has_pid && !has_sid)
                         ? "<!doctype" : "<!DOCTYPE") < 0)
                rc = -1;
            if (rc == 0 && PyUnicode_GET_LENGTH(v) > 0) {
                if (acc_ch(&s->out, ' ') < 0 ||
                    acc_unicode(&s->out, v) < 0)
                    rc = -1;
            }
            if (rc == 0 && has_pid) {
                if (acc_cstr(&s->out, " PUBLIC \"") < 0 ||
                    acc_unicode(&s->out, pid) < 0 ||
                    acc_ch(&s->out, '"') < 0)
                    rc = -1;
            } else if (rc == 0 && has_sid) {
                if (acc_cstr(&s->out, " SYSTEM") < 0)
                    rc = -1;
            }
            if (rc == 0 && has_sid) {
                if (acc_cstr(&s->out, " \"") < 0 ||
                    acc_unicode(&s->out, sid) < 0 ||
                    acc_ch(&s->out, '"') < 0)
                    rc = -1;
            }
            if (rc == 0 && isub != Py_None) {
                if (!PyUnicode_Check(isub))
                    rc = S_BAIL;
                else if (acc_cstr(&s->out, " [") < 0 ||
                         acc_unicode(&s->out, isub) < 0 ||
                         acc_ch(&s->out, ']') < 0)
                    rc = -1;
            }
            if (rc == 0 && acc_ch(&s->out, '>') < 0)
                rc = -1;
        }
        Py_XDECREF(v);
        Py_XDECREF(pid);
        Py_XDECREF(sid);
        Py_XDECREF(isub);
        return rc;
    }
    if (tp == (PyTypeObject *)g_xmldecl) {
        PyObject *v = PyObject_GetAttr(node, s_value);
        PyObject *attrs = PyObject_GetAttr(node, s_attrs);
        PyObject *isdecl = PyObject_GetAttr(node, s_is_declaration);
        int rc = 0;
        if (v == NULL || attrs == NULL || isdecl == NULL)
            rc = -1;
        else if (!PyUnicode_Check(v) || !PyDict_Check(attrs))
            rc = S_BAIL;
        else {
            int decl = PyObject_IsTrue(isdecl);
            if (decl < 0)
                rc = -1;
            else {
                if (acc_ch(&s->out, '<') < 0 ||
                    acc_ch(&s->out, decl ? '!' : '?') < 0 ||
                    acc_unicode(&s->out, v) < 0)
                    rc = -1;
                Py_ssize_t pos = 0;
                PyObject *k, *val;
                while (rc == 0 && PyDict_Next(attrs, &pos, &k, &val)) {
                    if (!PyUnicode_Check(k) ||
                        (val != Py_None && !PyUnicode_Check(val))) {
                        rc = S_BAIL;
                        break;
                    }
                    if (acc_ch(&s->out, ' ') < 0 ||
                        acc_unicode(&s->out, k) < 0) {
                        rc = -1;
                        break;
                    }
                    if (val != Py_None) {
                        if (acc_cstr(&s->out, "=\"") < 0 ||
                            escape_into(&s->out, val, FOR_ATTRIBUTE) < 0 ||
                            acc_ch(&s->out, '"') < 0) {
                            rc = -1;
                            break;
                        }
                    }
                }
                if (rc == 0) {
                    if (!decl && acc_ch(&s->out, '?') < 0)
                        rc = -1;
                    if (rc == 0 && acc_ch(&s->out, '>') < 0)
                        rc = -1;
                }
            }
        }
        Py_XDECREF(v);
        Py_XDECREF(attrs);
        Py_XDECREF(isdecl);
        return rc;
    }
    /* unknown leaf class: python emits nothing for unlisted types, but an
     * unknown class here means an unexpected tree — bail to be safe */
    return S_BAIL;
}

/* _Pretty.add_node — 0/-1/S_BAIL */
static int
add_node(Ser *s, PyObject *node, Py_ssize_t depth, PyObject *children,
         Py_ssize_t idx)
{
    int si = should_indent(s, node, children, idx);
    if (si < 0)
        return -1;
    if (si && indent(s, depth) < 0)
        return -1;
    return leaf_html(s, node);
}

/* ------------------------------------------------------------ traversal */

typedef struct {
    PyObject *node;      /* borrowed (kept alive by the tree) */
    PyObject *kids;      /* owned: node.children */
    Py_ssize_t kidx;
    Py_ssize_t depth;
    int pseudo;
} SFrame;

static PyObject *
serialize_pretty(PyObject *self, PyObject *args)
{
    PyObject *roots, *root_exempt;
    if (!PyArg_ParseTuple(args, "OO", &roots, &root_exempt))
        return NULL;
    if (g_element == NULL) {
        PyErr_SetString(PyExc_RuntimeError, "fastser not configured");
        return NULL;
    }
    if (!PyList_Check(roots)) {
        PyErr_SetString(PyExc_TypeError, "roots must be a list");
        return NULL;
    }
    Ser s;
    s.out.buf = NULL;
    s.out.len = 0;
    s.out.cap = 0;
    s.preserve = 0;
    s.root = root_exempt;
    /* initial preserve: ancestors of the exempt root incl. itself */
    {
        PyObject *n = root_exempt;
        Py_INCREF(n);
        while (n != Py_None) {
            if (PyObject_TypeCheck(n, (PyTypeObject *)g_element)) {
                long fl = get_flags(n);
                if (fl < 0) {
                    Py_DECREF(n);
                    return NULL;
                }
                if (fl & F_PRESERVE) {
                    s.preserve = 1;
                    break;
                }
            }
            PyObject *p = PyObject_GetAttr(n, s_parent);
            Py_DECREF(n);
            if (p == NULL)
                return NULL;
            n = p;
        }
        Py_DECREF(n);
    }

    SFrame *frames = PyMem_Malloc(MAX_DEPTH * sizeof(SFrame));
    if (frames == NULL) {
        PyMem_Free(s.out.buf);
        return PyErr_NoMemory();
    }
    int rc = 0;
    Py_ssize_t nroots = PyList_GET_SIZE(roots);
    for (Py_ssize_t ri = 0; ri < nroots && rc == 0; ri++) {
        PyObject *root = PyList_GET_ITEM(roots, ri);
        /* sibling context of the root: its real parent's children (matches
         * the Python helpers, which always consult node.parent) */
        PyObject *rsib = NULL;       /* owned or NULL */
        Py_ssize_t rsidx = -1;
        {
            PyObject *p = PyObject_GetAttr(root, s_parent);
            if (p == NULL) {
                rc = -1;
                break;
            }
            if (p != Py_None) {
                PyObject *pch = PyObject_GetAttr(p, s_children);
                if (pch == NULL || !PyList_Check(pch)) {
                    Py_XDECREF(pch);
                    Py_DECREF(p);
                    rc = pch == NULL ? -1 : S_BAIL;
                    break;
                }
                for (Py_ssize_t j = 0; j < PyList_GET_SIZE(pch); j++)
                    if (PyList_GET_ITEM(pch, j) == root) {
                        rsidx = j;
                        break;
                    }
                if (rsidx < 0) {
                    Py_DECREF(pch);
                    Py_DECREF(p);
                    rc = S_BAIL;   /* detached-from-parent anomaly */
                    break;
                }
                rsib = pch;
            }
            Py_DECREF(p);
        }

        int depth = -1;
        /* dispatch a node; if element, push frame */
#define DISPATCH(child, cdepth, sibl, sidx)                                  \
        do {                                                                 \
            PyTypeObject *tp = Py_TYPE(child);                               \
            if (PyObject_TypeCheck(child, (PyTypeObject *)g_element)) {      \
                int pseudo =                                                 \
                    PyObject_TypeCheck(child, (PyTypeObject *)g_pseudo);     \
                PyObject *kids = PyObject_GetAttr(child, s_children);        \
                if (kids == NULL || !PyList_Check(kids)) {                   \
                    Py_XDECREF(kids);                                        \
                    rc = kids == NULL ? -1 : S_BAIL;                         \
                    break;                                                   \
                }                                                            \
                if (!pseudo) {                                               \
                    rc = add_head(&s, child, kids, cdepth, sibl, sidx);      \
                    if (rc != 0) {                                           \
                        Py_DECREF(kids);                                     \
                        break;                                               \
                    }                                                        \
                }                                                            \
                if (depth + 1 >= MAX_DEPTH) {                                \
                    Py_DECREF(kids);                                         \
                    rc = S_BAIL;                                             \
                    break;                                                   \
                }                                                            \
                depth++;                                                     \
                frames[depth].node = child;                                  \
                frames[depth].kids = kids;                                   \
                frames[depth].kidx = 0;                                      \
                frames[depth].depth = cdepth;                                \
                frames[depth].pseudo = pseudo;                               \
            } else if (tp == (PyTypeObject *)g_textnode) {                   \
                rc = add_text(&s, child, cdepth, sibl, sidx);                \
            } else {                                                         \
                rc = add_node(&s, child, cdepth, sibl, sidx);                \
            }                                                                \
        } while (0)

        DISPATCH(root, 0, rsib, rsidx);
        while (rc == 0 && depth >= 0) {
            SFrame *f = &frames[depth];
            if (f->kidx < PyList_GET_SIZE(f->kids)) {
                Py_ssize_t i = f->kidx++;
                PyObject *child = PyList_GET_ITEM(f->kids, i);
                DISPATCH(child, f->depth + 1, f->kids, i);
            } else {
                if (!f->pseudo)
                    rc = add_tail(&s, f->node, f->kids, f->depth);
                Py_DECREF(f->kids);
                depth--;
            }
        }
#undef DISPATCH
        /* release frames on abnormal exit */
        while (depth >= 0) {
            Py_DECREF(frames[depth].kids);
            depth--;
        }
        Py_XDECREF(rsib);
    }
    PyMem_Free(frames);
    PyObject *result = NULL;
    if (rc == 0)
        result = PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND, s.out.buf,
                                           s.out.len);
    PyMem_Free(s.out.buf);
    if (rc == S_BAIL) {
        PyErr_Clear();
        Py_RETURN_NONE;
    }
    return result;   /* NULL on rc<0 with error set, or FromKindAndData */
}

static PyMethodDef methods[] = {
    {"configure", configure, METH_VARARGS,
     "configure(Element, PseudoTextElement, Document, TextNode, CDataNode, "
     "DataNode, CommentNode, DoctypeNode, XmlDeclNode, html_flags, "
     "tag_flags, ns_html, boolean_attrs, KNOWN, VOID, BLOCK, "
     "INLINE_CONTAINER, SELF_CLOSE, SEEN_SELF_CLOSE, PRESERVE_WS)"},
    {"serialize_pretty", serialize_pretty, METH_VARARGS,
     "serialize_pretty(roots, root_exempt) -> str or None (bail)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "jsoup_fastser", NULL, -1, methods,
};

PyMODINIT_FUNC
PyInit_jsoup_fastser(void)
{
    if (init_interned() < 0)
        return NULL;
    return PyModule_Create(&moduledef);
}

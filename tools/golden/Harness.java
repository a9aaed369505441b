// Golden-fixture harness: drives the compiled reference (jsoup, compiled separately
// under /tmp/jsoupbuild) to produce expected outputs for our PySpark-native engine's
// equivalence tests. Protocol: stdin lines `op\tb64(html)\tb64(arg1)\tb64(arg2)`,
// stdout one line `b64(result)` per input (UTF-8 throughout).
//
// Ops:
//   tree     html baseUri          -> canonical s-expression of the parsed document
//   xmltree  html baseUri          -> same, XML parser
//   fragtree html contextTag       -> same, fragment parse in context
//   text     html baseUri          -> body().text()
//   wholetext html                 -> body().wholeText()
//   title    html                  -> doc.title()
//   select   html query            -> per match: tag \u0001 id \u0001 ownText, joined by \u0002
//   selcount html query            -> number of matches
//   clean    html safelistName     -> cleaned body html (jsoup pretty-print default)
//   cleantree html safelistName    -> canonical tree of cleaned body fragment
//   spans    html baseUri          -> span-emitter golden: kind \u0001 text \u0001 ref per line (\u0002-joined)
//
// The span emitter is OUR engine's spec (title, then interleaved text/media/data in
// document order, text flushed at media/data barriers) computed here over the
// reference DOM so Python output can be compared span-for-span.
import org.jsoup.Jsoup;
import org.jsoup.nodes.*;
import org.jsoup.parser.Parser;
import org.jsoup.parser.Tag;
import org.jsoup.safety.Safelist;
import org.jsoup.select.Elements;
import org.jsoup.select.NodeTraversor;
import org.jsoup.select.NodeVisitor;

import java.io.*;
import java.nio.charset.StandardCharsets;
import java.util.*;

public class Harness {
    static String b64d(String s) { return new String(Base64.getDecoder().decode(s), StandardCharsets.UTF_8); }
    static String b64e(String s) { return Base64.getEncoder().encodeToString(s.getBytes(StandardCharsets.UTF_8)); }

    public static void main(String[] args) throws Exception {
        BufferedReader in = new BufferedReader(new InputStreamReader(System.in, StandardCharsets.UTF_8));
        PrintWriter out = new PrintWriter(new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
        String line;
        while ((line = in.readLine()) != null) {
            if (line.isEmpty()) continue;
            String[] parts = line.split("\t", -1);
            String op = parts[0];
            String a1 = parts.length > 1 ? b64d(parts[1]) : "";
            String a2 = parts.length > 2 ? b64d(parts[2]) : "";
            String res;
            try {
                res = dispatch(op, a1, a2);
            } catch (Throwable t) {
                res = "!ERROR: " + t.getClass().getSimpleName() + ": " + t.getMessage();
            }
            out.println(b64e(res));
            out.flush();
        }
    }

    static String dispatch(String op, String a1, String a2) {
        switch (op) {
            case "tree": return canonical(Jsoup.parse(a1, a2));
            case "xmltree": return canonical(Jsoup.parse(a1, a2, Parser.xmlParser()));
            case "fragtree": {
                Document shell = Document.createShell("");
                org.jsoup.nodes.Element ctx = shell.body().appendElement(a2.isEmpty() ? "div" : a2);
                List<Node> nodes = Parser.parseFragment(a1, ctx, "");
                StringBuilder sb = new StringBuilder();
                for (Node n : nodes) canonNode(n, sb);
                return sb.toString();
            }
            case "text": return Jsoup.parse(a1, a2).body().text();
            case "html": return Jsoup.parse(a1, a2).html();
            case "bodyhtml": return Jsoup.parse(a1, a2).body().html();
            case "wholetext": return Jsoup.parse(a1).body().wholeText();
            case "title": return Jsoup.parse(a1).title();
            case "select":
            case "selectxml": {
                // a2 optionally "cssContext\u0001query": evaluate from the
                // first match of cssContext instead of the document
                Document doc = op.equals("selectxml")
                    ? Jsoup.parse(a1, "", org.jsoup.parser.Parser.xmlParser())
                    : Jsoup.parse(a1);
                String css = null, q2 = a2;
                int sep2 = a2.indexOf('\u0001');
                if (sep2 >= 0) { css = a2.substring(0, sep2); q2 = a2.substring(sep2 + 1); }
                org.jsoup.nodes.Element sctx = css == null || css.isEmpty()
                    ? doc : doc.select(css).first();
                if (sctx == null) return "";
                Elements els = sctx.select(q2);
                StringBuilder sb = new StringBuilder();
                for (org.jsoup.nodes.Element el : els) {
                    if (sb.length() > 0) sb.append('\u0002');
                    sb.append(el.tagName()).append('\u0001').append(el.id()).append('\u0001').append(el.ownText());
                }
                return sb.toString();
            }
            case "selcount": return String.valueOf(Jsoup.parse(a1).select(a2).size());
            case "cssel": {
                // cssSelector() of every element in document order,
                // \u0002-joined (a2 = "xml" for the xmlParser path)
                Document doc = a2.equals("xml")
                    ? Jsoup.parse(a1, "", org.jsoup.parser.Parser.xmlParser())
                    : Jsoup.parse(a1);
                StringBuilder sb = new StringBuilder();
                for (org.jsoup.nodes.Element el : doc.getAllElements()) {
                    if (el == doc) continue;
                    if (sb.length() > 0) sb.append('\u0002');
                    sb.append(el.cssSelector());
                }
                return sb.toString();
            }
            case "xpath":
            case "xpathxml": {
                // a2 = xpath query, optionally "cssContext\u0001xpath" to
                // evaluate from the first CSS match instead of the document.
                // Result: per node, nodeName \u0001 id \u0001 ownText (elements)
                // or #text/#comment \u0001 \u0001 content, \u0002-joined.
                // xpathxml: same, over an xmlParser parse (namespace-aware
                // W3CDom conversion path).
                Document doc = op.equals("xpathxml")
                    ? Jsoup.parse(a1, "", org.jsoup.parser.Parser.xmlParser())
                    : Jsoup.parse(a1);
                String css = null, q = a2;
                int sep = a2.indexOf('\u0001');
                if (sep >= 0) { css = a2.substring(0, sep); q = a2.substring(sep + 1); }
                org.jsoup.nodes.Element ctx = css == null || css.isEmpty()
                    ? doc : doc.select(css).first();
                if (ctx == null) return "";
                List<Node> nodes = ctx.selectXpath(q, Node.class);
                StringBuilder sb = new StringBuilder();
                for (Node n : nodes) {
                    if (sb.length() > 0) sb.append('\u0002');
                    if (n instanceof org.jsoup.nodes.Element) {
                        org.jsoup.nodes.Element el = (org.jsoup.nodes.Element) n;
                        sb.append(el.tagName()).append('\u0001').append(el.id())
                          .append('\u0001').append(el.ownText());
                    } else if (n instanceof org.jsoup.nodes.TextNode) {
                        sb.append("#text").append('\u0001').append('\u0001')
                          .append(((org.jsoup.nodes.TextNode) n).getWholeText());
                    } else if (n instanceof org.jsoup.nodes.Comment) {
                        sb.append("#comment").append('\u0001').append('\u0001')
                          .append(((org.jsoup.nodes.Comment) n).getData());
                    } else {
                        sb.append(n.nodeName()).append('\u0001').append('\u0001');
                    }
                }
                return sb.toString();
            }
            case "clean": return Jsoup.clean(a1, safelist(a2));
            case "cleantree": {
                String cleaned = Jsoup.clean(a1, safelist(a2));
                Document doc = Jsoup.parse(cleaned);
                StringBuilder sb = new StringBuilder();
                for (Node n : doc.body().childNodes()) canonNode(n, sb);
                return sb.toString();
            }
            case "spans": return spans(Jsoup.parse(a1, a2));
            case "escape": {
                // a1 = text, a2 = "mode,charset" (mode: xhtml|base|extended)
                String[] ma = a2.split(",", 2);
                Document.OutputSettings os = new Document.OutputSettings()
                    .charset(ma[1]);
                switch (ma[0]) {
                    case "xhtml": os.escapeMode(Entities.EscapeMode.xhtml); break;
                    case "extended": os.escapeMode(Entities.EscapeMode.extended); break;
                    default: os.escapeMode(Entities.EscapeMode.base); break;
                }
                return Entities.escape(a1, os);
            }
            case "customtree": {
                // fixed custom TagSet exercising every customizable option
                // (TagSet.java:88-97 customizers + valueOf-registered tags);
                // mirrored exactly by tests/test_tagset.py::_custom_tagset
                org.jsoup.parser.TagSet ts = org.jsoup.parser.TagSet.Html();
                ts.valueOf("x-raw", Parser.NamespaceHtml).set(Tag.Data);
                ts.valueOf("x-rc", Parser.NamespaceHtml).set(Tag.RcData);
                ts.valueOf("custom-pre", Parser.NamespaceHtml).set(Tag.PreserveWhitespace).set(Tag.Block);
                ts.valueOf("custom-widget", Parser.NamespaceHtml).set(Tag.TextBoundary);
                ts.onNewTag(tag -> {
                    if (!tag.isKnownTag() && tag.normalName().startsWith("u-")) tag.set(Tag.SelfClose);
                    if (tag.normalName().equals("v-void")) tag.set(Tag.Void);
                });
                Parser parser = Parser.htmlParser().tagSet(ts);
                Document doc = Jsoup.parse(a1, "", parser);
                String body_text = doc.body() != null ? doc.body().text() : "";
                String body_whole = doc.body() != null ? doc.body().wholeText() : "";
                return canonical(doc) + "" + doc.html() + "" + body_text + "" + body_whole;
            }
            case "w3ctree": {
                // W3CDom conversion structure (helper/W3CDom.java):
                // canonical dump of the converted org.w3c.dom tree,
                // mirrored by jsoup_spark/helper/w3cdom.py tests
                Document jdoc = a2.equals("xml")
                    ? Jsoup.parse(a1, "", Parser.xmlParser())
                    : Jsoup.parse(a1);
                org.w3c.dom.Document w = new org.jsoup.helper.W3CDom().fromJsoup(jdoc);
                StringBuilder sb = new StringBuilder();
                org.w3c.dom.NodeList kids = w.getChildNodes();
                for (int i = 0; i < kids.getLength(); i++) w3cNode(kids.item(i), sb);
                return sb.toString();
            }
            case "casetree": {
                // ParseSettings case preservation (parser/ParseSettings.java):
                // a2 = two chars, preserveTagCase then preserveAttributeCase
                // ('t'/'f'). Output: canonical tree   doc.html().
                boolean pt = a2.length() > 0 && a2.charAt(0) == 't';
                boolean pa = a2.length() > 1 && a2.charAt(1) == 't';
                Parser p = Parser.htmlParser().settings(new org.jsoup.parser.ParseSettings(pt, pa));
                Document doc = Jsoup.parse(a1, "", p);
                return canonical(doc) + "\u0003" + doc.html();
            }
            case "charsetdoc": {
                // Document.charset(Charset) meta-charset sync
                // (nodes/Document.java:270-335). a2 = "CHARSET" or
                // "CHARSET|xml" (sets output syntax to xml first).
                String[] cs = a2.split("\\|", -1);
                Document doc = Jsoup.parse(a1);
                if (cs.length > 1 && cs[1].equals("xml"))
                    doc.outputSettings().syntax(Document.OutputSettings.Syntax.xml);
                doc.charset(java.nio.charset.Charset.forName(cs[0]));
                return doc.html();
            }
            case "positions": return positions(Jsoup.parse(a1, Parser.htmlParser().setTrackPosition(true)));
            case "posxml": return positions(Jsoup.parse(a1, "", Parser.xmlParser().setTrackPosition(true)));
            default: return "!ERROR: unknown op " + op;
        }
    }

    // ---- W3CDom canonical structure dump ----
    static void w3cNode(org.w3c.dom.Node n, StringBuilder sb) {
        switch (n.getNodeType()) {
            case org.w3c.dom.Node.ELEMENT_NODE: {
                sb.append('(').append(n.getNodeName());
                String ns = n.getNamespaceURI();
                sb.append('{').append(ns == null ? "" : ns).append('}');
                org.w3c.dom.NamedNodeMap attrs = n.getAttributes();
                java.util.TreeMap<String, String> sorted = new java.util.TreeMap<>();
                for (int i = 0; i < attrs.getLength(); i++) {
                    org.w3c.dom.Node a = attrs.item(i);
                    String ans = a.getNamespaceURI();
                    sorted.put(a.getNodeName() + '{' + (ans == null ? "" : ans) + '}', a.getNodeValue());
                }
                for (java.util.Map.Entry<String, String> e : sorted.entrySet())
                    sb.append(' ').append(e.getKey()).append('=').append(e.getValue()).append('\u0001');
                org.w3c.dom.NodeList kids = n.getChildNodes();
                for (int i = 0; i < kids.getLength(); i++) w3cNode(kids.item(i), sb);
                sb.append(')');
                break;
            }
            case org.w3c.dom.Node.TEXT_NODE:
                sb.append('"').append(n.getNodeValue()).append('"');
                break;
            case org.w3c.dom.Node.COMMENT_NODE:
                sb.append("<!--").append(n.getNodeValue()).append("-->");
                break;
            case org.w3c.dom.Node.DOCUMENT_TYPE_NODE: {
                org.w3c.dom.DocumentType dt = (org.w3c.dom.DocumentType) n;
                sb.append("<!DOCTYPE ").append(dt.getName()).append('|')
                  .append(dt.getPublicId() == null ? "" : dt.getPublicId()).append('|')
                  .append(dt.getSystemId() == null ? "" : dt.getSystemId()).append('>');
                break;
            }
            default: break;
        }
    }

    // ---- source-position golden: per node (DFS incl. doc):
    // name \u0001 srcStart,srcEnd \u0001 endStart,endEnd  (\u0002-joined)
    static String positions(Document doc) {
        StringBuilder sb = new StringBuilder();
        posNode(doc, sb);
        return sb.toString();
    }

    static void posNode(Node n, StringBuilder sb) {
        if (sb.length() > 0) sb.append('\u0002');
        org.jsoup.nodes.Range src = n.sourceRange();
        sb.append(n.nodeName()).append('\u0001')
          .append(src.startPos()).append(',').append(src.endPos());
        if (n instanceof org.jsoup.nodes.Element) {
            org.jsoup.nodes.Element el = (org.jsoup.nodes.Element) n;
            org.jsoup.nodes.Range end = el.endSourceRange();
            sb.append('\u0001').append(end.startPos()).append(',').append(end.endPos());
            for (Attribute a : el.attributes()) {
                org.jsoup.nodes.Range.AttributeRange ar = a.sourceRange();
                sb.append('\u0001').append(a.getKey()).append('=')
                  .append(ar.nameRange().startPos()).append(',').append(ar.nameRange().endPos())
                  .append(',').append(ar.valueRange().startPos()).append(',').append(ar.valueRange().endPos());
            }
        } else {
            sb.append("\u0001-,-");
        }
        for (Node c : n.childNodes()) posNode(c, sb);
    }

    static Safelist safelist(String name) {
        switch (name) {
            case "none": return Safelist.none();
            case "simpleText": return Safelist.simpleText();
            case "basic": return Safelist.basic();
            case "basicWithImages": return Safelist.basicWithImages();
            case "relaxed": return Safelist.relaxed();
            default: throw new IllegalArgumentException("safelist " + name);
        }
    }

    // Canonical tree: (tag{ns} [k=v ...] children...) / "text" / #data:... / #c:... / #dt:... / #cd:...
    static String canonical(Document doc) {
        StringBuilder sb = new StringBuilder();
        for (Node n : doc.childNodes()) canonNode(n, sb);
        return sb.toString();
    }

    static void canonNode(Node n, StringBuilder sb) {
        if (n instanceof org.jsoup.nodes.Element) {
            org.jsoup.nodes.Element el = (org.jsoup.nodes.Element) n;
            sb.append('(').append(el.tagName());
            String ns = el.tag().namespace();
            if (!ns.equals("http://www.w3.org/1999/xhtml")) sb.append('{').append(ns).append('}');
            for (Attribute a : el.attributes()) {
                sb.append(" [").append(a.getKey()).append('=').append(esc(a.getValue())).append(']');
            }
            for (Node c : el.childNodes()) canonNode(c, sb);
            sb.append(')');
        } else if (n instanceof CDataNode) {
            sb.append("#cd:").append(esc(((CDataNode) n).getWholeText())).append(';');
        } else if (n instanceof TextNode) {
            sb.append('"').append(esc(((TextNode) n).getWholeText())).append('"');
        } else if (n instanceof DataNode) {
            sb.append("#data:").append(esc(((DataNode) n).getWholeData())).append(';');
        } else if (n instanceof Comment) {
            sb.append("#c:").append(esc(((Comment) n).getData())).append(';');
        } else if (n instanceof DocumentType) {
            DocumentType dt = (DocumentType) n;
            sb.append("#dt:").append(esc(dt.name())).append('|').append(esc(dt.publicId())).append('|').append(esc(dt.systemId())).append(';');
        } else if (n instanceof XmlDeclaration) {
            XmlDeclaration xd = (XmlDeclaration) n;
            sb.append("#xd:").append(esc(xd.name())).append('|').append(esc(xd.getWholeDeclaration())).append(';');
        } else {
            sb.append("#?:").append(n.nodeName()).append(';');
        }
    }

    static String esc(String s) {
        return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)").replace("\"", "\\\"")
                .replace(";", "\\;").replace("[", "\\[").replace("]", "\\]").replace("|", "\\|");
    }

    // ---- span emitter golden (engine spec; see jsoup_spark/extract/spans.py) ----
    // barriers are HTML-namespace elements only; text separators use the
    // element's actual tag flags (so foreign-content elements with HTML-like
    // names do not get HTML semantics — matches Element.text())
    static final String NS_HTML = "http://www.w3.org/1999/xhtml";
    static final Set<String> MEDIA = new HashSet<>(Arrays.asList(
        "img", "video", "audio", "source", "embed", "iframe", "track"));
    static final Set<String> DATA_TAGS = new HashSet<>(Arrays.asList("script", "style"));

    static String spans(Document doc) {
        List<String[]> out = new ArrayList<>();
        String title = doc.title();
        if (!title.isEmpty()) out.add(new String[]{"title", title, ""});
        org.jsoup.nodes.Element body = doc.body();
        StringBuilder accum = new StringBuilder();
        NodeTraversor.traverse(new NodeVisitor() {
            @Override public void head(Node node, int depth) {
                if (node instanceof TextNode) {
                    appendNormalised(accum, (TextNode) node);
                } else if (node instanceof org.jsoup.nodes.Element) {
                    org.jsoup.nodes.Element el = (org.jsoup.nodes.Element) node;
                    String name = el.tagName();
                    boolean htmlNs = el.tag().namespace().equals(NS_HTML);
                    if (htmlNs && MEDIA.contains(name)) {
                        flush(out, accum);
                        String ref = el.hasAttr("src") ? el.absUrl("src") : "";
                        if (ref.isEmpty() && el.hasAttr("src")) ref = el.attr("src");
                        String alt = el.hasAttr("alt") ? el.attr("alt").trim() : "";
                        out.add(new String[]{"media", alt, ref});
                    } else if (htmlNs && DATA_TAGS.contains(name)) {
                        flush(out, accum);
                        out.add(new String[]{"data", el.data(), ""});
                    } else {
                        if (accum.length() > 0 && needsLeadingSep(el) && !lastWs(accum)) accum.append(' ');
                    }
                }
            }
            @Override public void tail(Node node, int depth) {
                if (node instanceof org.jsoup.nodes.Element) {
                    org.jsoup.nodes.Element el = (org.jsoup.nodes.Element) node;
                    Node next = node.nextSibling();
                    if (needsTrailingSep(el)
                        && (next instanceof TextNode || (next instanceof org.jsoup.nodes.Element && isInline((org.jsoup.nodes.Element) next)))
                        && !lastWs(accum)) accum.append(' ');
                }
            }
        }, body);
        flush(out, accum);
        StringBuilder sb = new StringBuilder();
        for (String[] s : out) {
            if (sb.length() > 0) sb.append('\u0002');
            sb.append(s[0]).append('\u0001').append(s[1]).append('\u0001').append(s[2]);
        }
        return sb.toString();
    }

    static void flush(List<String[]> out, StringBuilder accum) {
        String t = accum.toString().trim();
        accum.setLength(0);
        if (!t.isEmpty()) out.add(new String[]{"text", t, ""});
    }

    static boolean lastWs(StringBuilder sb) {
        return sb.length() > 0 && sb.charAt(sb.length() - 1) == ' ';
    }

    static boolean isInline(org.jsoup.nodes.Element el) { return !el.isBlock(); }

    static boolean needsLeadingSep(org.jsoup.nodes.Element el) {
        // mirror of Element.TextAccumulator.needsLeadingTextSeparator (Element.java:1589-1594)
        return el.isBlock() || el.nameIs("br")
            || (el.tag().is(Tag.TextBoundary) && el.childNodeSize() > 0 && el.hasText());
    }

    static boolean needsTrailingSep(org.jsoup.nodes.Element el) {
        // mirror of needsTrailingTextSeparator (Element.java:1597-1601)
        if (el.tag().is(Tag.TextBoundary) || el.isBlock()) return true;
        for (int i = 0; i < el.childNodeSize(); i++) {
            Node c = el.childNode(i);
            if (c instanceof org.jsoup.nodes.Element && ((org.jsoup.nodes.Element) c).isBlock()) return true;
        }
        return false;
    }

    static boolean preserveWS(Node node) {
        int i = 0;
        Node n = node;
        while (n instanceof org.jsoup.nodes.Element && i < 6) {
            if (((org.jsoup.nodes.Element) n).tag().preserveWhitespace())
                return true;
            n = n.parent(); i++;
        }
        return false;
    }

    static void appendNormalised(StringBuilder accum, TextNode tn) {
        String text = tn.getWholeText();
        if (preserveWS(tn.parent()) || tn instanceof CDataNode) { accum.append(text); return; }
        // StringUtil.appendNormalisedWhitespace (StringUtil.java:234-253): whitespace set is
        // { \t \n \f \r space nbsp }, invisible chars {U+200B, U+00AD} dropped,
        // stripLeading = lastCharIsWhitespace(accum) (TextNode.java:117-119).
        boolean stripLeading = lastWs(accum);
        boolean lastWasWhite = false;
        boolean reachedNonWhite = false;
        int c;
        for (int i = 0; i < text.length(); i += Character.charCount(c)) {
            c = text.codePointAt(i);
            if (c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == 160) {
                if ((stripLeading && !reachedNonWhite) || lastWasWhite) continue;
                accum.append(' ');
                lastWasWhite = true;
            } else if (c != 8203 && c != 173) {
                accum.appendCodePoint(c);
                lastWasWhite = false;
                reachedNonWhite = true;
            }
        }
    }
}

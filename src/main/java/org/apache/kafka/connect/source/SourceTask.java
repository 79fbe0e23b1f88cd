/* Minimal binary-compatible Kafka Connect API declaration — see ConnectorContext.java. */
package org.apache.kafka.connect.source;

import java.util.List;
import java.util.Map;

import org.apache.kafka.connect.connector.Task;

public abstract class SourceTask implements Task {

    protected SourceTaskContext context;

    public void initialize(SourceTaskContext context) {
        this.context = context;
    }

    @Override
    public abstract void start(Map<String, String> props);

    public abstract List<SourceRecord> poll() throws InterruptedException;

    public void commit() throws InterruptedException {
    }

    public void commitRecord(SourceRecord record) throws InterruptedException {
    }

    @Override
    public abstract void stop();
}
